"""Adversarial edge-case fixtures for the pure-numpy COCOeval replacement
(tpucv/metrics/coco_map.py), each hand-computed per the pycocotools
algorithm (cocoeval.py evaluateImg/accumulate/summarize semantics) —
VERDICT round 1, item 8: tie-breaks, iscrowd, area-range boundaries,
maxDets, and the -1 empty-bucket convention.
"""

import numpy as np
import pytest

from tpucv.metrics.coco_map import COCOMeanAP, IOU_THRS


@pytest.fixture(autouse=True, params=["numpy", "native"])
def engine(request, monkeypatch):
    """Run every edge fixture through BOTH engines: the numpy reference and
    the C++ core (tpucv/native/cocoeval.cpp)."""
    use_native = request.param == "native"
    if use_native:
        from tpucv.native import load
        if load("cocoeval") is None:
            pytest.skip("native cocoeval unavailable (no g++)")
    orig = COCOMeanAP.accumulate
    monkeypatch.setattr(
        COCOMeanAP, "accumulate",
        lambda self: orig(self, use_native=use_native))
    return request.param


def _gt(img, cat, box, area=None, iscrowd=0):
    return {"image_id": img, "category_id": cat, "bbox": list(box),
            "area": float(area if area is not None else box[2] * box[3]),
            "iscrowd": iscrowd}


def _dt(img, cat, box, score):
    return {"image_id": img, "category_id": cat, "bbox": list(box),
            "score": float(score)}


def test_perfect_single_detection():
    gts = [_gt(1, 1, (10, 10, 20, 20))]
    dts = [_dt(1, 1, (10, 10, 20, 20), 0.9)]
    st = COCOMeanAP(gts, dts, [1]).accumulate().summarize()
    assert st["AP"] == 1.0 and st["AP50"] == 1.0 and st["AP75"] == 1.0
    assert st["AR100"] == 1.0


def test_pure_false_positive_is_zero_not_negative():
    gts = [_gt(1, 1, (10, 10, 20, 20))]
    dts = [_dt(1, 1, (200, 200, 20, 20), 0.9)]   # no overlap
    st = COCOMeanAP(gts, dts, [1]).accumulate().summarize()
    assert st["AP"] == 0.0 and st["AR100"] == 0.0


def test_empty_category_is_excluded_not_zero():
    """A category with no GTs anywhere stays -1 and must not drag the mean
    (pycocotools: precision[...] == -1 excluded in _summarize)."""
    gts = [_gt(1, 1, (10, 10, 20, 20))]
    dts = [_dt(1, 1, (10, 10, 20, 20), 0.9),
           _dt(1, 2, (50, 50, 20, 20), 0.8)]     # cat 2 has no gts
    st = COCOMeanAP(gts, dts, [1, 2]).accumulate().summarize()
    assert st["AP"] == 1.0                       # cat2 excluded, not 0.5


def test_iou_exactly_at_threshold_matches():
    """IoU == t counts as a match (pycocotools: `if ious < iou: continue`
    with iou initialised to min(t, 1-1e-10))."""
    # det covers exactly half of gt and nothing else: IoU = 0.5
    gts = [_gt(1, 1, (0, 0, 10, 10))]
    dts = [_dt(1, 1, (0, 0, 10, 5), 0.9)]        # inter 50, union 100
    ev = COCOMeanAP(gts, dts, [1]).accumulate()
    # matched at t=0.5 only
    t0 = int(np.where(np.isclose(IOU_THRS, 0.5))[0][0])
    assert ev.precision[t0, 0, 0, 0, 2] == 1.0
    t1 = int(np.where(np.isclose(IOU_THRS, 0.55))[0][0])
    assert ev.precision[t1, 0, 0, 0, 2] == 0.0


def test_tie_break_prefers_later_gt():
    """Two gts with IDENTICAL IoU to one det: pycocotools keeps updating on
    `>=`, so the LAST gt in (ignore-sorted, original) order wins."""
    gts = [_gt(1, 1, (0, 0, 10, 10)), _gt(1, 1, (20, 0, 10, 10))]
    # det overlapping both gts equally is impossible with disjoint gts;
    # instead: one det exactly equal to each gt, plus a third det with
    # equal IoU 0.5 to... simpler: verify via evaluate that a det with
    # equal IoU to two gts leaves the FIRST gt unmatched.
    # Construct: gt0=(0,0,10,10), gt1=(0,10,10,10); det=(0,5,10,10)
    gts = [_gt(1, 1, (0, 0, 10, 10)), _gt(1, 1, (0, 10, 10, 10))]
    dts = [_dt(1, 1, (0, 5, 10, 10), 0.9)]       # IoU 1/3 with both
    ev = COCOMeanAP(gts, dts, [1]).accumulate()
    e = ev._evaluate_img(1, 1, (0.0, 1e10), 100)
    t0 = int(np.where(np.isclose(IOU_THRS, 0.5))[0][0])
    # at t=0.5 IoU 1/3 < 0.5: unmatched
    assert e["dt_matched"][t0, 0] == -1
    # recompute matching directly at a threshold below 1/3 via the raw
    # structure: the 0.30... isn't in IOU_THRS, so instead assert the
    # matched gt at... construct a variant where IoU=0.6 with both:
    gts2 = [_gt(1, 1, (0, 0, 10, 15)), _gt(1, 1, (0, 5, 10, 15))]
    dts2 = [_dt(1, 1, (0, 2.5, 10, 15), 0.9)]    # symmetric: equal IoU
    ev2 = COCOMeanAP(gts2, dts2, [1])
    e2 = ev2._evaluate_img(1, 1, (0.0, 1e10), 100)
    # equal IoU = 12.5*10/(2*150-125) = 125/175 = 0.714 with both
    t_idx = int(np.where(np.isclose(IOU_THRS, 0.7))[0][0])
    assert e2["dt_matched"][t_idx, 0] == 1      # later gt wins the tie


def test_crowd_gt_neither_tp_nor_fp():
    """A det matching only a crowd gt is ignored entirely; the crowd gt
    does not count in the recall denominator."""
    gts = [_gt(1, 1, (0, 0, 50, 50), iscrowd=1),
           _gt(1, 1, (100, 100, 10, 10))]
    dts = [_dt(1, 1, (0, 0, 50, 50), 0.9),       # inside the crowd only
           _dt(1, 1, (100, 100, 10, 10), 0.8)]   # real TP
    st = COCOMeanAP(gts, dts, [1]).accumulate().summarize()
    assert st["AP"] == 1.0                       # crowd det not an FP
    assert st["AR100"] == 1.0                    # denominator excludes crowd


def test_crowd_iou_is_intersection_over_det_area():
    """Crowd IoU = inter / det_area: a small det fully inside a big crowd
    region 'matches' it at any threshold (pycocotools maskUtils iscrowd)."""
    gts = [_gt(1, 1, (0, 0, 100, 100), iscrowd=1)]
    dts = [_dt(1, 1, (10, 10, 5, 5), 0.9)]       # plain IoU would be 0.0025
    ev = COCOMeanAP(gts, dts, [1]).accumulate()
    e = ev._evaluate_img(1, 1, (0.0, 1e10), 100)
    assert (e["dt_ignore"]).all()                # ignored at every t


def test_crowd_does_not_block_multiple_dets():
    """gtm is not enforced for crowd gts: TWO dets can both match the same
    crowd region and both be ignored."""
    gts = [_gt(1, 1, (0, 0, 100, 100), iscrowd=1)]
    dts = [_dt(1, 1, (10, 10, 20, 20), 0.9),
           _dt(1, 1, (50, 50, 20, 20), 0.8)]
    ev = COCOMeanAP(gts, dts, [1]).accumulate()
    e = ev._evaluate_img(1, 1, (0.0, 1e10), 100)
    assert e["dt_ignore"].all()


def test_area_boundary_inclusive_both_sides():
    """area == 32^2 is in-range for BOTH small and medium (pycocotools
    ignores only area < rng[0] or area > rng[1])."""
    box = (0, 0, 32, 32)                          # area exactly 1024
    gts = [_gt(1, 1, box)]
    dts = [_dt(1, 1, box, 0.9)]
    st = COCOMeanAP(gts, dts, [1]).accumulate().summarize()
    assert st["APs"] == 1.0 and st["APm"] == 1.0  # both buckets populated


def test_unmatched_det_outside_area_range_not_fp():
    """In the 'small' range, an unmatched LARGE det is ignored, not an FP."""
    gts = [_gt(1, 1, (0, 0, 20, 20))]             # small gt (area 400)
    dts = [_dt(1, 1, (0, 0, 20, 20), 0.9),        # TP
           _dt(1, 1, (200, 200, 100, 100), 0.95)]  # large FP elsewhere
    st = COCOMeanAP(gts, dts, [1]).accumulate().summarize()
    # in 'small', the large det is ignored => APs untouched by it
    assert st["APs"] == 1.0
    # in 'all', the higher-scored large det IS an FP before the TP =>
    # precision at recall>0 is 0.5
    assert st["AP"] < 1.0


def test_maxdets_one_keeps_top_scored_only():
    gts = [_gt(1, 1, (0, 0, 10, 10)), _gt(1, 1, (50, 0, 10, 10))]
    dts = [_dt(1, 1, (0, 0, 10, 10), 0.6),
           _dt(1, 1, (50, 0, 10, 10), 0.9)]
    st = COCOMeanAP(gts, dts, [1]).accumulate().summarize()
    assert st["AR100"] == 1.0
    assert abs(st["AR1"] - 0.5) < 1e-9            # only the 0.9 det counted


def test_second_det_on_same_gt_is_fp():
    """Duplicate detection of one gt: second (lower-scored) det is an FP."""
    gts = [_gt(1, 1, (0, 0, 10, 10))]
    dts = [_dt(1, 1, (0, 0, 10, 10), 0.9),
           _dt(1, 1, (0.5, 0, 10, 10), 0.8)]
    ev = COCOMeanAP(gts, dts, [1]).accumulate()
    t0 = int(np.where(np.isclose(IOU_THRS, 0.5))[0][0])
    e = ev._evaluate_img(1, 1, (0.0, 1e10), 100)
    assert e["dt_matched"][t0, 0] == 0
    assert e["dt_matched"][t0, 1] == -1 and not e["dt_ignore"][t0, 1]


def test_hand_computed_ap_two_images():
    """Mixed scenario, AP@0.5 hand-computed through the 101-point rule.

    img1: gt A; img2: gt B. dets (global score order):
      s=0.9 TP on A, s=0.8 FP, s=0.7 TP on B.
    cum: tp=[1,1,2], fp=[0,1,1]; rc=[0.5,0.5,1.0]; pr=[1.0,0.5,2/3].
    envelope pr -> [1.0, 2/3, 2/3].
    101-pt: recThrs <= 0.5 -> searchsorted left gives first rc >= thr:
      thr in [0,0.5] -> idx 0 -> 1.0 (51 pts);
      thr in (0.5,1.0] -> idx 2 -> 2/3 (50 pts).
    AP50 = (51*1.0 + 50*2/3)/101.
    """
    gts = [_gt(1, 1, (0, 0, 10, 10)), _gt(2, 1, (0, 0, 10, 10))]
    dts = [_dt(1, 1, (0, 0, 10, 10), 0.9),
           _dt(1, 1, (300, 300, 10, 10), 0.8),
           _dt(2, 1, (0, 0, 10, 10), 0.7)]
    st = COCOMeanAP(gts, dts, [1]).accumulate().summarize()
    expect = (51 * 1.0 + 50 * (2 / 3)) / 101
    assert abs(st["AP50"] - expect) < 1e-9
    assert st["AR100"] == 1.0
