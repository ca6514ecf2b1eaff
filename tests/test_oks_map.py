"""OKS keypoint mAP engine (COCOeval iouType='keypoints' protocol) —
value-checked against the pycocotools computeOks formula by hand."""

import numpy as np
import pytest

from tpucv.metrics.coco_map import COCOKeypointAP, OKS_SIGMAS


def _gt(img, kpts, bbox=(0, 0, 50, 50), crowd=0, nkp=None):
    kpts = np.asarray(kpts, float).reshape(-1)
    if nkp is None:
        nkp = int((kpts[2::3] > 0).sum())
    return {"image_id": img, "category_id": 1, "bbox": list(bbox),
            "area": bbox[2] * bbox[3], "iscrowd": crowd,
            "keypoints": kpts, "num_keypoints": nkp}


def _dt(img, kpts, score=0.9):
    return {"image_id": img, "category_id": 1,
            "keypoints": np.asarray(kpts, float).reshape(-1),
            "score": score}


def _full_kpts(xy=(10.0, 10.0), v=2.0, nk=17):
    return [[xy[0], xy[1], v]] * nk


def test_perfect_detections_score_ap_one():
    gts = [_gt(0, _full_kpts((10, 10))), _gt(1, _full_kpts((30, 20)))]
    dts = [_dt(0, _full_kpts((10, 10))), _dt(1, _full_kpts((30, 20)))]
    st = COCOKeypointAP(gts, dts, [1]).accumulate().summarize()
    assert st["AP"] == pytest.approx(1.0)
    assert st["AR"] == pytest.approx(1.0)


def test_oks_value_matches_formula():
    """One visible joint offset by d: OKS = exp(-d^2 / (2 * (2s)^2 * area))."""
    area = 50.0 * 50.0
    d = 5.0
    kg = [[10.0, 10.0, 2.0]] + [[0.0, 0.0, 0.0]] * 16
    kd = [[10.0 + d, 10.0, 2.0]] + [[0.0, 0.0, 0.0]] * 16
    ev = COCOKeypointAP([_gt(0, kg)], [_dt(0, kd)], [1])
    ious = ev._iou([_dt(0, kd)], [_gt(0, kg)], np.zeros(1))
    var = (2 * OKS_SIGMAS[0]) ** 2
    expect = np.exp(-(d * d) / var / area / 2)
    assert ious[0, 0] == pytest.approx(expect, rel=1e-9)


def test_kptless_gt_is_ignore_region():
    """A detection overlapping only a keypoint-less GT must be neither TP
    nor FP (pycocotools: g.ignore when no labeled keypoints) — AP for the
    real GT stays 1.0."""
    gts = [_gt(0, _full_kpts((10, 10))),
           _gt(0, [[0, 0, 0]] * 17, bbox=(100, 100, 40, 40))]
    dts = [_dt(0, _full_kpts((10, 10)), 0.9),
           # lands inside the expanded box of the kpt-less GT -> ignored
           _dt(0, _full_kpts((118, 118)), 0.8)]
    st = COCOKeypointAP(gts, dts, [1]).accumulate().summarize()
    assert st["AP"] == pytest.approx(1.0)
    # control: with the second GT fully labeled, the off-joint detection
    # still matches it at lower OKS thresholds only -> AP drops below 1
    gts2 = [_gt(0, _full_kpts((10, 10))),
            _gt(0, _full_kpts((130, 130)), bbox=(100, 100, 40, 40))]
    st2 = COCOKeypointAP(gts2, dts, [1]).accumulate().summarize()
    assert st2["AP"] < 1.0


def test_wrong_keypoints_are_false_positives():
    gts = [_gt(0, _full_kpts((10, 10)))]
    dts = [_dt(0, _full_kpts((10, 10)), 0.9),
           _dt(0, _full_kpts((45, 45)), 0.95)]   # higher-scored miss
    st = COCOKeypointAP(gts, dts, [1]).accumulate().summarize()
    assert st["AP50"] == pytest.approx(0.5, abs=0.02)


def test_area_ranges_medium_large():
    """Keypoints protocol has no 'small' range; medium/large split at 96^2."""
    ev = COCOKeypointAP([], [], [1])
    assert list(ev.area_rng) == ["all", "medium", "large"]
    assert ev.max_dets == (20,)


def test_pose_harness_oracle_end_to_end():
    """Synthetic pose index + oracle detections built from its own GT
    records -> bbox AP and OKS AP both 1.0 through the full evaluator."""
    from tpucv.data.pose_dataset import SyntheticPoseIndex
    from tpucv.metrics.coco_map import COCOMeanAP

    idx = SyntheticPoseIndex(4, 96, nk=17, seed=0)
    gts = [r for i in range(len(idx)) for r in idx.eval_gt_records(i)]
    dts_box = [{"image_id": g["image_id"], "category_id": 1,
                "bbox": g["bbox"], "score": 0.9} for g in gts]
    dts_kpt = [{"image_id": g["image_id"], "category_id": 1,
                "keypoints": g["keypoints"], "score": 0.9} for g in gts]
    box = COCOMeanAP(gts, dts_box, idx.cat_ids).accumulate().summarize()
    kpt = COCOKeypointAP(gts, dts_kpt, idx.cat_ids).accumulate().summarize()
    assert box["AP"] == pytest.approx(1.0)
    assert kpt["AP"] == pytest.approx(1.0)
