"""Unit tests for box geometry, anchors and NMS (reference parity anchors:
SURVEY.md §4 — 8732 SSD300 priors, 8400 YOLOv8-640 anchors, greedy NMS keep
sets)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpucv.ops import boxes as B
from tpucv.ops.anchors import generate_ssd_anchors, make_anchors
from tpucv.ops.nms import batched_nms, nms, non_max_suppression


def test_xywh_xyxy_roundtrip():
    b = jnp.array([[10.0, 20.0, 4.0, 6.0]])
    xyxy = B.xywh2xyxy(b)
    np.testing.assert_allclose(xyxy, [[8, 17, 12, 23]])
    np.testing.assert_allclose(B.xyxy2xywh(xyxy), b)


def test_pairwise_iou_known_values():
    a = jnp.array([[0.0, 0, 10, 10], [0, 0, 5, 5]])
    b = jnp.array([[0.0, 0, 10, 10], [5, 5, 10, 10]])
    iou = B.pairwise_iou(a, b)
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(iou[0, 1], 0.25, atol=1e-5)
    np.testing.assert_allclose(iou[1, 1], 0.0, atol=1e-5)


def test_ciou_less_than_iou_for_offset_boxes():
    b1 = jnp.array([5.0, 5.0, 4.0, 4.0])
    b2 = jnp.array([7.0, 5.0, 4.0, 2.0])
    iou = B.bbox_iou(b1, b2)
    ciou = B.bbox_iou(b1, b2, ciou=True)
    assert ciou < iou


def test_dist2bbox_bbox2dist_roundtrip():
    anchor = jnp.array([[10.0, 10.0]])
    box = jnp.array([[6.0, 7.0, 13.0, 12.0]])
    d = B.bbox2dist(box, anchor, reg_max=16)
    back = B.dist2bbox(d, anchor)
    np.testing.assert_allclose(back, box, atol=1e-5)


def test_make_anchors_counts_640():
    pts, strides = make_anchors([(80, 80), (40, 40), (20, 20)], (8, 16, 32))
    assert pts.shape == (8400, 2)
    assert strides.shape == (8400, 1)
    # first anchor at (0.5, 0.5), level strides correct
    np.testing.assert_allclose(pts[0], [0.5, 0.5])
    assert float(strides[0, 0]) == 8 and float(strides[-1, 0]) == 32


def test_ssd300_prior_count():
    # SSD300 config (reference configs/ssd_cfg.py): 8732 priors
    priors = generate_ssd_anchors(
        input_size=300,
        feature_shapes=[38, 19, 10, 5, 3, 1],
        anchor_sizes=[30, 60, 111, 162, 213, 264, 315],
        aspect_ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]],
    )
    assert priors.shape == (8732, 4)
    assert float(priors.min()) >= 0.0 and float(priors.max()) <= 1.0


def test_nms_suppresses_overlaps():
    boxes = jnp.array([
        [0.0, 0, 10, 10],
        [1.0, 1, 11, 11],   # heavy overlap with 0
        [20.0, 20, 30, 30],
    ])
    scores = jnp.array([0.9, 0.8, 0.7])
    idx, valid = nms(boxes, scores, iou_threshold=0.5, max_det=3)
    kept = set(np.asarray(idx)[np.asarray(valid)].tolist())
    assert kept == {0, 2}


def test_batched_nms_is_class_aware():
    boxes = jnp.array([[0.0, 0, 10, 10], [1.0, 1, 11, 11]])
    scores = jnp.array([0.9, 0.8])
    same = batched_nms(boxes, scores, jnp.array([0, 0]), 0.5, 2)
    diff = batched_nms(boxes, scores, jnp.array([0, 1]), 0.5, 2)
    assert int(same[1].sum()) == 1
    assert int(diff[1].sum()) == 2


def test_non_max_suppression_fixed_shapes():
    A, nc = 64, 4
    key = jax.random.PRNGKey(0)
    pred = jax.random.uniform(key, (A, 4 + nc))
    pred = pred.at[:, 2:4].add(20.0)  # sane wh
    pred = pred.at[:, :2].multiply(100.0)
    out = non_max_suppression(pred, 0.25, 0.45, 10, 32, False)
    boxes, scores, classes, valid = out
    assert boxes.shape == (10, 4) and scores.shape == (10,)
    assert classes.dtype == jnp.int32 and valid.dtype == jnp.bool_
    # scores sorted descending among valid
    s = np.asarray(scores)
    v = np.asarray(valid)
    if v.sum() > 1:
        assert (np.diff(s[v]) <= 1e-6).all()
