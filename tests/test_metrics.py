"""mAP engines on hand-built cases with analytically known values."""

import numpy as np

from tpucv.metrics.coco_map import COCOMeanAP
from tpucv.metrics.seg_metrics import SegmentationMetrics
from tpucv.metrics.voc_map import evaluate_voc_map, voc_ap


def test_voc_ap_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert abs(voc_ap(rec, prec) - 1.0) < 1e-9


def test_voc_map_perfect_detection():
    gts = [{"image_id": 0, "class_id": 0, "bbox": [0, 0, 10, 10]}]
    dts = [{"image_id": 0, "class_id": 0, "bbox": [0, 0, 10, 10], "score": 0.9}]
    res = evaluate_voc_map(gts, dts, ["a"], 0.5)
    assert abs(res["mAP"] - 1.0) < 1e-9


def test_voc_map_miss_and_fp():
    gts = [{"image_id": 0, "class_id": 0, "bbox": [0, 0, 10, 10]},
           {"image_id": 1, "class_id": 0, "bbox": [0, 0, 10, 10]}]
    dts = [
        {"image_id": 0, "class_id": 0, "bbox": [0, 0, 10, 10], "score": 0.9},
        {"image_id": 1, "class_id": 0, "bbox": [50, 50, 60, 60], "score": 0.8},
    ]
    res = evaluate_voc_map(gts, dts, ["a"], 0.5)
    # one TP at rank 1 (p=1, r=0.5), one FP: AP = 0.5
    assert abs(res["mAP"] - 0.5) < 1e-9


def test_voc_map_duplicate_detection_is_fp():
    gts = [{"image_id": 0, "class_id": 0, "bbox": [0, 0, 10, 10]}]
    dts = [
        {"image_id": 0, "class_id": 0, "bbox": [0, 0, 10, 10], "score": 0.9},
        {"image_id": 0, "class_id": 0, "bbox": [1, 1, 10, 10], "score": 0.8},
    ]
    res = evaluate_voc_map(gts, dts, ["a"], 0.5)
    assert abs(res["mAP"] - 1.0) < 1e-9  # dup is FP after recall=1


def test_coco_map_perfect():
    gts = [{"image_id": 0, "category_id": 1, "bbox": [0, 0, 50, 50],
            "area": 2500.0, "iscrowd": 0}]
    dts = [{"image_id": 0, "category_id": 1, "bbox": [0, 0, 50, 50],
            "score": 0.9}]
    ev = COCOMeanAP(gts, dts, [1]).accumulate()
    s = ev.summarize()
    assert abs(s["AP"] - 1.0) < 1e-6
    assert abs(s["AP50"] - 1.0) < 1e-6
    assert abs(s["AR100"] - 1.0) < 1e-6


def test_coco_map_iou_sweep():
    # det IoU with gt = 0.5/0.605 ~ 0.826 -> TP for thresholds <= 0.80
    gts = [{"image_id": 0, "category_id": 1, "bbox": [0, 0, 100, 100],
            "area": 10000.0, "iscrowd": 0}]
    dts = [{"image_id": 0, "category_id": 1, "bbox": [0, 0, 100, 90],
            "score": 0.9}]
    ev = COCOMeanAP(gts, dts, [1]).accumulate()
    s = ev.summarize()
    # IoU = 9000/10000 = 0.9 -> matches t in {.5..0.9} = 9 of 10 -> AP 0.9
    assert abs(s["AP"] - 0.9) < 1e-6
    assert abs(s["AP50"] - 1.0) < 1e-6


def test_coco_crowd_is_ignored():
    gts = [{"image_id": 0, "category_id": 1, "bbox": [0, 0, 100, 100],
            "area": 10000.0, "iscrowd": 1}]
    dts = [{"image_id": 0, "category_id": 1, "bbox": [10, 10, 50, 50],
            "score": 0.9}]
    ev = COCOMeanAP(gts, dts, [1]).accumulate()
    s = ev.summarize()
    # no countable GT and the det matches the crowd region -> excluded
    assert s["AP"] == -1.0 or s["AP"] == 0.0


def test_seg_metrics_identity():
    m = SegmentationMetrics(3)
    pred = np.array([[0, 1], [2, 2]])
    m.update(pred, pred)
    r = m.compute()
    assert abs(r["mIoU"] - 1.0) < 1e-6
    assert abs(r["overall_acc"] - 1.0) < 1e-6


def test_seg_metrics_ignore_index():
    m = SegmentationMetrics(2)
    pred = np.array([0, 1, 1])
    label = np.array([0, 0, 255])  # last ignored
    m.update(pred, label)
    r = m.compute()
    assert abs(r["overall_acc"] - 0.5) < 1e-6
