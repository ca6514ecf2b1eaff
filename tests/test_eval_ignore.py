"""Ignore-region eval protocol, wired end-to-end through the harness.

The reference treats COCO ``iscrowd`` GTs as ignore regions (pycocotools
matching, used at core/algorithms/yolo_v8.py:330-381) and VOC ``difficult``
objects likewise (core/metrics/mAP.py:352-386).  These tests drive
``evaluate_on_coco`` / ``evaluate_on_voc`` with a stubbed detection stream
and assert a detection overlapping a crowd (resp. difficult) GT is neither
TP nor FP — the discriminating setup puts the ignored detection FIRST in
score order, so a protocol that counted it as FP would halve the AP.
"""

import json
import os

import numpy as np
import pytest

from tpucv.builder import export_from_registry
from tpucv.data.coco import COCOIndex
from tpucv.data.voc import VOCDetectionIndex


def _algo():
    cfg, algo_cls, _ = export_from_registry("yolo8_det")
    return algo_cls(cfg)


# --------------------------------------------------------------------- COCO
def _write_coco(tmp_path):
    js = {
        "images": [{"id": 7, "file_name": "000000000007.jpg",
                    "height": 480, "width": 640}],
        "annotations": [
            {"id": 1, "image_id": 7, "category_id": 1,
             "bbox": [10.0, 10.0, 30.0, 30.0], "area": 900.0, "iscrowd": 0},
            {"id": 2, "image_id": 7, "category_id": 1,
             "bbox": [100.0, 100.0, 100.0, 100.0], "area": 10000.0,
             "iscrowd": 1},
        ],
        "categories": [{"id": 1, "name": "person"}, {"id": 2, "name": "bicycle"}],
    }
    p = tmp_path / "instances.json"
    p.write_text(json.dumps(js))
    return str(p)


def test_coco_index_keeps_crowd_flagged(tmp_path):
    index = COCOIndex(_write_coco(tmp_path), str(tmp_path))
    # training view: crowd excluded
    _, boxes, labels = index[0]
    assert boxes.shape == (1, 4) and np.allclose(boxes[0], [10, 10, 40, 40])
    # eval view: both records, crowd flagged, official areas preserved
    recs = index.eval_gt_records(0)
    assert [r["iscrowd"] for r in recs] == [0, 1]
    assert recs[1]["bbox"] == [100.0, 100.0, 100.0, 100.0]
    assert recs[0]["area"] == 900.0 and recs[1]["area"] == 10000.0


def test_evaluate_on_coco_crowd_is_ignore_region(tmp_path):
    index = COCOIndex(_write_coco(tmp_path), str(tmp_path))
    algo = _algo()

    def fake_batched(variables, idx, batch_size, conf_threshold):
        # crowd-overlapping det scores HIGHER than the true det: if it were
        # counted as FP it would precede the TP and drag AP to 0.5
        yield 0, np.array([[120.0, 120.0, 180.0, 180.0],
                           [10.0, 10.0, 40.0, 40.0]], np.float32), \
            np.array([0.9, 0.8], np.float32), np.array([0, 0], np.int32)

    algo._batched_detections = fake_batched
    stats = algo.evaluate_on_coco(None, index, result_dir=str(tmp_path / "r"))
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AP50"] == pytest.approx(1.0)


def test_evaluate_on_coco_without_ignore_would_fail(tmp_path):
    """Control: the same detections against a crowd-stripped GT set (the
    old protocol) yield AP 0.5 — proves the ignore wiring is load-bearing."""
    from tpucv.metrics.coco_map import COCOMeanAP

    gts = [{"image_id": 7, "category_id": 1, "bbox": [10.0, 10.0, 30.0, 30.0],
            "area": 900.0, "iscrowd": 0}]
    dts = [{"image_id": 7, "category_id": 1,
            "bbox": [120.0, 120.0, 60.0, 60.0], "score": 0.9},
           {"image_id": 7, "category_id": 1,
            "bbox": [10.0, 10.0, 30.0, 30.0], "score": 0.8}]
    stats = COCOMeanAP(gts, dts, [1, 2]).accumulate().summarize()
    assert stats["AP"] == pytest.approx(0.5, abs=1e-6)


# ---------------------------------------------------------------------- VOC
def _write_voc(tmp_path):
    ann = tmp_path / "Annotations"
    sets = tmp_path / "ImageSets" / "Main"
    ann.mkdir(parents=True)
    sets.mkdir(parents=True)
    (sets / "val.txt").write_text("img0\n")
    (ann / "img0.xml").write_text(
        "<annotation><size><width>640</width><height>480</height></size>"
        "<object><name>aeroplane</name><difficult>0</difficult>"
        "<bndbox><xmin>10</xmin><ymin>10</ymin>"
        "<xmax>40</xmax><ymax>40</ymax></bndbox></object>"
        "<object><name>aeroplane</name><difficult>1</difficult>"
        "<bndbox><xmin>100</xmin><ymin>100</ymin>"
        "<xmax>200</xmax><ymax>200</ymax></bndbox></object>"
        "</annotation>")
    return str(tmp_path)


def test_voc_index_keeps_difficult_flagged(tmp_path):
    index = VOCDetectionIndex(_write_voc(tmp_path), split="val")
    _, boxes, labels = index[0]
    assert boxes.shape == (1, 4)          # training view drops difficult
    eboxes, elabels, ediff = index.eval_record(0)
    assert eboxes.shape == (2, 4) and list(ediff) == [False, True]


def test_evaluate_on_voc_difficult_is_ignore(tmp_path):
    from tpucv.configs.dataset_cfg import VOC_CLASSES

    index = VOCDetectionIndex(_write_voc(tmp_path), split="val")
    algo = _algo()
    algo.class_names = list(VOC_CLASSES)        # VOC xml, VOC name table
    cid = VOC_CLASSES.index("aeroplane")        # order-agnostic class id

    def fake_batched(variables, idx, batch_size, conf_threshold):
        yield 0, np.array([[100.0, 100.0, 200.0, 200.0],
                           [10.0, 10.0, 40.0, 40.0]], np.float32), \
            np.array([0.9, 0.8], np.float32), \
            np.array([cid, cid], np.int32)

    algo._batched_detections = fake_batched
    res = algo.evaluate_on_voc(None, index)
    assert res["per_class"]["aeroplane"]["n_gt"] == 1   # difficult ignored
    assert res["mAP"] == pytest.approx(1.0)
    # COCO-protocol cross-summary over the SAME artifacts (the reference
    # runs get_coco_map alongside get_map, mAP.py:930-958): perfect
    # detections -> AP 1.0 at every threshold, and difficult maps to
    # iscrowd=1 ignore so the high-scoring difficult-overlap det is not FP
    assert res["coco"]["AP"] == pytest.approx(1.0)
    assert res["coco"]["AP75"] == pytest.approx(1.0)


def test_voc_coco_cross_summary_discriminates():
    """Control for the cross-summary: a det that matches only at IoU 0.5
    (not .75+) scores AP50 1.0 but AP@[.5:.95] well below 1 — proves the
    cross-summary actually runs the multi-threshold protocol, not a copy
    of the VOC number."""
    from tpucv.algorithms.base import DetectionAlgorithm

    gts = [{"image_id": 0, "class_id": 0,
            "bbox": [0.0, 0.0, 100.0, 100.0], "difficult": False}]
    # ~0.56 IoU with the GT: TP at 0.5/0.55, FP from 0.6 up
    dts = [{"image_id": 0, "class_id": 0,
            "bbox": [0.0, 0.0, 75.0, 75.0], "score": 0.9}]
    stats = DetectionAlgorithm._coco_cross_summary(gts, dts)
    assert stats["AP50"] == pytest.approx(1.0)
    assert stats["AP"] == pytest.approx(0.2, abs=1e-6)  # 2 of 10 thresholds
    assert stats["AP75"] == pytest.approx(0.0)


def test_evaluate_on_voc_without_ignore_would_fail():
    """Control: same detections with the difficult GT stripped → AP 0.5."""
    from tpucv.metrics.voc_map import evaluate_voc_map

    gts = [{"image_id": 0, "class_id": 0, "bbox": [10, 10, 40, 40]}]
    dts = [{"image_id": 0, "class_id": 0,
            "bbox": [100, 100, 200, 200], "score": 0.9},
           {"image_id": 0, "class_id": 0,
            "bbox": [10, 10, 40, 40], "score": 0.8}]
    res = evaluate_voc_map(gts, dts, ["aeroplane"])
    assert res["mAP"] == pytest.approx(0.5, abs=1e-6)
