"""Instance-mask ops (reference ``core/utils/ultralytics_ops.py`` mask region
:540-651: crop_mask / process_mask / scale_image) — static-shape jnp."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def crop_mask(masks: jax.Array, boxes: jax.Array) -> jax.Array:
    """Zero mask pixels outside each box.

    masks: (N, H, W); boxes: (N, 4) xyxy in mask pixels.
    """
    n, h, w = masks.shape
    x1, y1, x2, y2 = jnp.split(boxes[:, :, None], 4, axis=1)  # (N,1,1)
    c = jnp.arange(w, dtype=boxes.dtype)[None, None, :]
    r = jnp.arange(h, dtype=boxes.dtype)[None, :, None]
    keep = (c >= x1) & (c < x2) & (r >= y1) & (r < y2)
    return masks * keep


def process_mask(
    protos: jax.Array,        # (Hp, Wp, n_masks)
    coefs: jax.Array,         # (N, n_masks)
    boxes: jax.Array,         # (N, 4) xyxy in input pixels
    input_hw,
    upsample: bool = False,
) -> jax.Array:
    """Combine prototypes with per-detection coefficients
    (reference process_mask): sigmoid(coefs @ protos), crop to boxes."""
    hp, wp, nm = protos.shape
    masks = jax.nn.sigmoid(
        jnp.einsum("nm,hwm->nhw", coefs.astype(jnp.float32),
                   protos.astype(jnp.float32)))
    ih, iw = input_hw
    scale = jnp.asarray([wp / iw, hp / ih, wp / iw, hp / ih], masks.dtype)
    masks = crop_mask(masks, boxes * scale)
    if upsample:
        masks = jax.image.resize(masks, (masks.shape[0], ih, iw), "bilinear")
    return masks
