"""Coordinate/segment/mask utility tail of ultralytics_ops (SURVEY §2.9):
format round-trips, letterbox rescale, contour extraction."""

import numpy as np
import pytest

from tpucv.ops.coords import (
    clip_boxes, ltwh2xywh, ltwh2xyxy, make_divisible, resample_segments,
    scale_boxes, scale_coords, segment2box, segments2boxes, xyn2xy,
    xywh2ltwh, xywhn2xyxy, xyxy2ltwh, xyxy2xywhn)
from tpucv.ops.masks import (
    masks2segments, process_mask_native, process_mask_upsample, scale_image)


def test_ltwh_xywh_xyxy_round_trips():
    rng = np.random.default_rng(0)
    xywh = np.abs(rng.normal(size=(7, 4))) + 0.5
    np.testing.assert_allclose(
        np.asarray(ltwh2xywh(xywh2ltwh(xywh))), xywh, atol=1e-6)
    xyxy = np.sort(rng.normal(size=(7, 2, 2)), axis=1).reshape(7, 4)[
        :, [0, 2, 1, 3]]
    np.testing.assert_allclose(
        np.asarray(ltwh2xyxy(xyxy2ltwh(xyxy))), xyxy, atol=1e-6)


def test_xywhn_round_trip():
    rng = np.random.default_rng(1)
    n = rng.uniform(0.2, 0.4, (5, 4))
    px = xywhn2xyxy(n, w=640, h=480)
    back = np.asarray(xyxy2xywhn(px, w=640, h=480))
    np.testing.assert_allclose(back, n, atol=1e-6)


def test_scale_boxes_undoes_letterbox():
    # 480x640 image letterboxed into 640x640: gain 1, pad (0, 80)
    canvas_box = np.array([[100.0, 180.0, 200.0, 280.0]])
    out = np.asarray(scale_boxes((640, 640), canvas_box, (480, 640)))
    np.testing.assert_allclose(out, [[100.0, 100.0, 200.0, 200.0]], atol=1e-5)


def test_scale_coords_keypoints_with_visibility():
    kpts = np.array([[[100.0, 180.0, 0.9], [640.0, 620.0, 0.1]]])
    out = np.asarray(scale_coords((640, 640), kpts, (480, 640)))
    np.testing.assert_allclose(out[0, 0], [100.0, 100.0, 0.9], atol=1e-5)
    assert out[0, 1, 1] == pytest.approx(480.0)     # clipped to image
    out_n = np.asarray(scale_coords((640, 640), kpts, (480, 640),
                                    normalize=True))
    np.testing.assert_allclose(out_n[0, 0, :2], [100 / 640, 100 / 480],
                               atol=1e-5)


def test_clip_boxes_and_xyn2xy():
    b = np.array([[-5.0, -5.0, 700.0, 500.0]])
    np.testing.assert_allclose(
        np.asarray(clip_boxes(b, (480, 640))), [[0, 0, 640, 480]])
    np.testing.assert_allclose(
        np.asarray(xyn2xy(np.array([[0.5, 0.5]]), w=640, h=480)),
        [[320.0, 240.0]])


def test_segment_utils():
    sq = np.array([[10.0, 10.0], [50.0, 10.0], [50.0, 30.0], [10.0, 30.0]])
    np.testing.assert_allclose(segment2box(sq), [10, 10, 50, 30])
    boxes = segments2boxes([sq, np.zeros((0, 2))])
    np.testing.assert_allclose(boxes[0], [30, 20, 40, 20])   # cxcywh
    rs = resample_segments([sq], n=100)[0]
    assert rs.shape == (100, 2)
    np.testing.assert_allclose(rs[0], sq[0], atol=1e-5)
    assert rs[:, 0].max() <= 50 and rs[:, 1].max() <= 30


def test_masks2segments_square():
    m = np.zeros((1, 64, 64), np.uint8)
    m[0, 16:32, 8:40] = 1
    seg = masks2segments(m)[0]
    assert seg.shape[1] == 2 and len(seg) >= 4
    assert seg[:, 0].min() == pytest.approx(8, abs=1) \
        and seg[:, 0].max() == pytest.approx(39, abs=1)
    assert masks2segments(np.zeros((1, 8, 8)))[0].shape == (0, 2)


def test_process_mask_upsample_and_native_shapes():
    import jax.numpy as jnp
    protos = jnp.ones((40, 40, 8))
    coefs = jnp.ones((3, 8)) * 0.1
    boxes_in = jnp.asarray([[0.0, 0, 80, 80]] * 3)        # input pixels
    up = process_mask_upsample(protos, coefs, boxes_in, (160, 160))
    assert up.shape == (3, 160, 160)
    # native: protos letterboxed for a 120x160 original
    nat = process_mask_native(protos, coefs,
                              jnp.asarray([[0.0, 0, 100, 100]] * 3),
                              (120, 160))
    assert nat.shape == (3, 120, 160)


def test_scale_image_crops_pad():
    m = np.zeros((640, 640, 1), np.float32)
    m[80:560] = 1.0          # content region for a 480x640 original
    out = scale_image(m, (480, 640))
    assert out.shape[:2] == (480, 640)
    assert out.mean() > 0.99


def test_make_divisible():
    assert make_divisible(17, 8) == 24
    assert make_divisible(16, 8) == 16
