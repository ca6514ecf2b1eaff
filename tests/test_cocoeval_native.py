"""Native C++ COCOeval (tpucv/native/cocoeval.cpp) vs the numpy reference
engine: exact tensor equality on randomized fixtures covering crowds, score
ties, area ranges, empty cells, and multi-image accumulation."""

import numpy as np
import pytest

from tpucv.metrics.coco_map import COCOMeanAP

pytestmark = pytest.mark.skipif(
    __import__("tpucv.native", fromlist=["load"]).load("cocoeval") is None,
    reason="native cocoeval unavailable (no g++)")


def _fuzz(seed, n_img=6, n_cat=4, n_gt=30, n_dt=60):
    rng = np.random.default_rng(seed)
    gts, dts = [], []
    for _ in range(n_gt):
        w, h = rng.uniform(2, 120, 2)
        x, y = rng.uniform(0, 200, 2)
        gts.append({"image_id": int(rng.integers(1, n_img + 1)),
                    "category_id": int(rng.integers(1, n_cat + 1)),
                    "bbox": [x, y, w, h], "area": float(w * h),
                    "iscrowd": int(rng.random() < 0.15)})
    for _ in range(n_dt):
        w, h = rng.uniform(2, 120, 2)
        x, y = rng.uniform(0, 200, 2)
        dts.append({"image_id": int(rng.integers(1, n_img + 1)),
                    "category_id": int(rng.integers(1, n_cat + 1)),
                    "bbox": [x, y, w, h],
                    "score": round(float(rng.random()), 2)})  # ties
    return gts, dts, list(range(1, n_cat + 1))


@pytest.mark.parametrize("seed", range(6))
def test_native_matches_numpy_fuzz(seed):
    gts, dts, cats = _fuzz(seed)
    a = COCOMeanAP(gts, dts, cats).accumulate(use_native=False)
    b = COCOMeanAP(gts, dts, cats).accumulate(use_native=True)
    np.testing.assert_allclose(a.precision, b.precision, atol=1e-12)
    np.testing.assert_allclose(a.recall, b.recall, atol=1e-12)


def test_native_empty_dts():
    gts, _, cats = _fuzz(0)
    a = COCOMeanAP(gts, [], cats).accumulate(use_native=False)
    b = COCOMeanAP(gts, [], cats).accumulate(use_native=True)
    np.testing.assert_allclose(a.precision, b.precision, atol=1e-12)
    np.testing.assert_allclose(a.recall, b.recall, atol=1e-12)


def test_native_empty_gts():
    _, dts, cats = _fuzz(0)
    a = COCOMeanAP([], dts, cats).accumulate(use_native=False)
    b = COCOMeanAP([], dts, cats).accumulate(use_native=True)
    np.testing.assert_allclose(a.precision, b.precision, atol=1e-12)
    np.testing.assert_allclose(a.recall, b.recall, atol=1e-12)


def test_native_refuses_overridden_matching_hooks():
    """A subclass customising _iou/_dt_area/_gt_extra_ignore must NOT take
    the bbox-only C++ path (code review r3: it would silently compute the
    bbox protocol); overriding only the protocol PARAMETERS keeps it."""
    gts, dts, cats = _fuzz(0)

    class CustomIoU(COCOMeanAP):
        def _iou(self, dts_, gts_, iscrowd):
            return super()._iou(dts_, gts_, iscrowd)  # same math, overridden

    assert not CustomIoU(gts, dts, cats)._accumulate_native()
    with pytest.raises(RuntimeError):
        CustomIoU(gts, dts, cats).accumulate(use_native=True)
    # numpy fallback still yields the standard result
    a = CustomIoU(gts, dts, cats).accumulate()
    b = COCOMeanAP(gts, dts, cats).accumulate(use_native=False)
    np.testing.assert_allclose(a.precision, b.precision, atol=1e-12)

    class CustomParams(COCOMeanAP):    # parameters pass through to the C core
        max_dets = (1, 10, 50)

    n = CustomParams(gts, dts, cats).accumulate(use_native=True)
    f = CustomParams(gts, dts, cats).accumulate(use_native=False)
    assert n.precision.shape == f.precision.shape
    np.testing.assert_allclose(n.precision, f.precision, atol=1e-12)
    np.testing.assert_allclose(n.recall, f.recall, atol=1e-12)
