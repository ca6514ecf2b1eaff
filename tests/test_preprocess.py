"""On-device preprocessing: letterbox_images parity with the reference's
host cv2 INTER_NEAREST letter_box (core/utils/image_process.py:48-66)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpucv.ops.preprocess import letterbox_images, normalize_images


def _cv2_ref_letterbox(img, S):
    """Reference letter_box semantics: INTER_NEAREST + centred 128 pad."""
    import cv2
    h, w, _ = img.shape
    scale = min(S / h, S / w)
    nh, nw = int(h * scale), int(w * scale)
    resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_NEAREST)
    top = (S - nh) // 2
    left = (S - nw) // 2
    canvas = np.full((S, S, 3), 128, np.uint8)
    canvas[top:top + nh, left:left + nw] = resized
    return canvas, scale, (left, top)


@pytest.mark.parametrize("hw", [(375, 500), (480, 640), (640, 427), (64, 64)])
def test_device_letterbox_matches_cv2_nearest(hw):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    S, C = 320, 640
    h, w = hw
    img = rng.integers(0, 255, (h, w, 3), np.uint8)
    canvas = np.zeros((C, C, 3), np.uint8)
    canvas[:h, :w] = img

    out, scale, pad = letterbox_images(
        jnp.asarray(canvas[None]), jnp.asarray([[h, w]], np.int32), S)
    ref, ref_scale, ref_pad = _cv2_ref_letterbox(img, S)

    np.testing.assert_allclose(float(scale[0]), ref_scale, rtol=1e-6)
    assert tuple(np.asarray(pad[0]).astype(int)) == ref_pad
    mismatch = (np.asarray(out[0]) != ref).mean()
    # cv2's nearest rounding can differ by one source pixel on exact .0
    # boundaries; require essentially identical output
    assert mismatch < 0.02, f"pixel mismatch fraction {mismatch}"


def test_device_letterbox_linear_mode_shapes():
    rng = np.random.default_rng(1)
    canvas = rng.integers(0, 255, (2, 256, 256, 3), np.uint8)
    hw = np.asarray([[200, 256], [256, 128]], np.int32)
    out, scale, pad = letterbox_images(
        jnp.asarray(canvas), jnp.asarray(hw), 128, method="linear")
    assert out.shape == (2, 128, 128, 3) and out.dtype == np.uint8
    # padding region is exactly fill
    o = np.asarray(out)
    assert (o[0, :14] == 128).all() and (o[0, -14:] == 128).all()


def test_normalize_images_range():
    x = jnp.asarray(np.array([[[[0, 128, 255]]]], np.uint8))
    y = np.asarray(normalize_images(x, jnp.float32))
    np.testing.assert_allclose(y.ravel(), [0.0, 128 / 255.0, 1.0], atol=1e-6)


def test_host_letterbox_geom_exact_f64_parity():
    """host_letterbox_geom must reproduce the host letter_box float64
    arithmetic for EVERY (h, w): the in-graph f32 geometry diverged by 1 px
    on ~6% of shapes (code review r3). Sweep includes known-divergent
    pairs like (200, 266)."""
    from tpucv.ops.preprocess import host_letterbox_geom

    S = 640
    hws = [(200, 266), (480, 640), (123, 457), (640, 640), (37, 611)]
    rng = np.random.default_rng(0)
    hws += [tuple(rng.integers(32, 1280, 2)) for _ in range(500)]
    hw = np.asarray(hws, np.int32)
    geom, scale = host_letterbox_geom(hw, S)
    for k, (h, w) in enumerate(hws):
        sc = min(S / h, S / w)                       # python f64, ref :56
        nh, nw = int(h * sc), int(w * sc)
        assert tuple(geom[k]) == (nh, nw, (S - nh) // 2, (S - nw) // 2), \
            (h, w, tuple(geom[k]), (nh, nw))
        assert scale[k] == pytest.approx(sc, rel=1e-6)


def test_device_letterbox_with_host_geom_dims_exact():
    """With host geometry passed in, the device letterbox places content
    in EXACTLY the host-f64 region for a shape where f32 is 1 px off
    ((200, 266) -> host nw=640, f32 floor gives 639)."""
    rng = np.random.default_rng(2)
    from tpucv.ops.preprocess import host_letterbox_geom

    S, C = 640, 640
    h, w = 200, 266
    img = rng.integers(1, 255, (h, w, 3), np.uint8)   # content never 0
    canvas = np.zeros((C, C, 3), np.uint8)
    canvas[:h, :w] = img
    hw = np.asarray([[h, w]], np.int32)
    geom, hscale = host_letterbox_geom(hw, S)
    nh, nw, top, left = map(int, geom[0])
    assert (nh, nw) == (int(h * min(S / h, S / w)), int(w * min(S / h, S / w)))
    out, scale, pad = letterbox_images(
        jnp.asarray(canvas[None]), jnp.asarray(hw), S,
        geom=jnp.asarray(geom), scale=jnp.asarray(hscale))
    o = np.asarray(out[0])
    content = (o != 128).any(-1)
    ys, xs = np.where(content)
    # content occupies exactly [top, top+nh) x [left, left+nw)
    assert ys.min() == top and ys.max() == top + nh - 1
    assert xs.min() == left and xs.max() == left + nw - 1
