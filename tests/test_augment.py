"""On-device augmentation tests: geometry consistency between image gather
and box arithmetic."""

import numpy as np

import jax
import jax.numpy as jnp

from tpucv.ops.augment import (
    AffineParams, augment_batch, sample_affine_params, _rgb_to_hsv,
    _hsv_to_rgb)


def test_hsv_roundtrip():
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.random((4, 4, 3)), jnp.float32)
    back = _hsv_to_rgb(_rgb_to_hsv(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-4)


def _identity_params(B):
    return AffineParams(
        scale=jnp.ones((B,)), shift=jnp.zeros((B, 2)),
        flip=jnp.zeros((B,), bool), hsv=jnp.ones((B, 3)))


def test_identity_augment_preserves_image_and_boxes():
    img = np.zeros((1, 32, 32, 3), np.uint8)
    img[0, 8:16, 4:12] = 200
    boxes = jnp.array([[[4.0, 8.0, 12.0, 16.0]]])
    out, ob = augment_batch(jnp.asarray(img), boxes, _identity_params(1),
                            dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ob), np.asarray(boxes))
    np.testing.assert_allclose(
        np.asarray(out[0, 12, 8]), [200 / 255] * 3, atol=1e-5)


def test_shift_moves_content_and_boxes_together():
    img = np.zeros((1, 32, 32, 3), np.uint8)
    img[0, 0:8, 0:8] = 255
    boxes = jnp.array([[[0.0, 0.0, 8.0, 8.0]]])
    p = AffineParams(jnp.ones((1,)), jnp.array([[8.0, 4.0]]),
                     jnp.zeros((1,), bool), jnp.ones((1, 3)))
    out, ob = augment_batch(jnp.asarray(img), boxes, p, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ob[0, 0]), [8, 4, 16, 12])
    assert float(out[0, 6, 10, 0]) > 0.9        # content followed the shift
    assert abs(float(out[0, 2, 2, 0]) - 128 / 255) < 1e-5  # vacated = fill


def test_flip_mirrors_boxes():
    img = np.zeros((1, 32, 32, 3), np.uint8)
    boxes = jnp.array([[[0.0, 0.0, 8.0, 8.0]]])
    p = AffineParams(jnp.ones((1,)), jnp.zeros((1, 2)),
                     jnp.ones((1,), bool), jnp.ones((1, 3)))
    _, ob = augment_batch(jnp.asarray(img), boxes, p, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ob[0, 0]), [24, 0, 32, 8])


def test_sampler_shapes_and_ranges():
    p = sample_affine_params(jax.random.PRNGKey(0), 8, 64)
    assert p.scale.shape == (8,)
    assert p.shift.shape == (8, 2)
    assert ((np.asarray(p.hsv[:, 0]) >= 0.9)
            & (np.asarray(p.hsv[:, 0]) <= 1.1)).all()


def test_flip_with_scale_keeps_boxes_on_content():
    """Regression: flip composed with scale/shift must keep boxes aligned
    with the gathered image content (flip happens in SOURCE space)."""
    img = np.zeros((1, 32, 32, 3), np.uint8)
    img[0, 8:16, 0:8] = 255                       # block at source x in [0,8)
    boxes = jnp.array([[[0.0, 8.0, 8.0, 16.0]]])
    p = AffineParams(jnp.full((1,), 0.5), jnp.zeros((1, 2)),
                     jnp.ones((1,), bool), jnp.ones((1, 3)))
    out, ob = augment_batch(jnp.asarray(img), boxes, p, dtype=jnp.float32)
    b = np.asarray(ob[0, 0])
    # source flip puts the block at x in [24,32); scale 0.5 -> [12,16)
    np.testing.assert_allclose(b, [12, 4, 16, 8], atol=1e-5)
    # the image content must be bright inside the transformed box...
    inside = np.asarray(out[0, 5, 13, 0])
    assert inside > 0.9
    # ...and background (fill) right outside it
    outside = np.asarray(out[0, 5, 10, 0])
    assert abs(outside - 128 / 255) < 0.02 or outside < 0.1
