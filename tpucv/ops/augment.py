"""On-device augmentation pipeline.

The reference runs its whole augmentation stack (jitter resize, placement,
hflip, HSV LUT — ``core/data/detection_dataset.py:132-220``) in CPU worker
processes. This module is the device-side re-design: the host ships one uint8
batch + per-sample random parameters, and a single jitted function applies
affine placement (gather-based), horizontal flip, HSV jitter and
normalisation on-chip — XLA fuses it into the first conv's input pipeline.

Box coordinates transform with the same parameters (pure arithmetic).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class AffineParams(NamedTuple):
    scale: jax.Array      # (B,) resize scale
    shift: jax.Array      # (B, 2) placement offset (x, y) px
    flip: jax.Array       # (B,) bool
    hsv: jax.Array        # (B, 3) gains (h, s, v)


def sample_affine_params(
    key: jax.Array, batch: int, size: int,
    scale_range: Tuple[float, float] = (0.5, 1.5),
    hgain: float = 0.1, sgain: float = 0.7, vgain: float = 0.4,
) -> AffineParams:
    ks = jax.random.split(key, 4)
    scale = jax.random.uniform(ks[0], (batch,), minval=scale_range[0],
                               maxval=scale_range[1])
    max_shift = jnp.maximum(size * (1.0 - scale), 0.0)
    shift = jax.random.uniform(ks[1], (batch, 2)) * max_shift[:, None]
    flip = jax.random.uniform(ks[2], (batch,)) < 0.5
    hsv = 1.0 + (jax.random.uniform(ks[3], (batch, 3)) * 2 - 1) * jnp.array(
        [hgain, sgain, vgain])
    return AffineParams(scale, shift, flip, hsv)


def _rgb_to_hsv(rgb: jax.Array) -> jax.Array:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    d = mx - mn + 1e-8
    h = jnp.where(
        mx == r, (g - b) / d % 6.0,
        jnp.where(mx == g, (b - r) / d + 2.0, (r - g) / d + 4.0)) / 6.0
    s = d / (mx + 1e-8)
    return jnp.stack([h, s, mx], axis=-1)


def _hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    h, s, v = hsv[..., 0] * 6.0, hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def augment_batch(
    images_u8: jax.Array,       # (B, S, S, 3) uint8 (already letterboxed)
    boxes: jax.Array,           # (B, M, 4) xyxy px
    params: AffineParams,
    fill: float = 128.0 / 255.0,
    dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array]:
    """Apply per-sample scale/shift/flip + HSV + normalise, on device.

    Returns (images dtype in [0,1], transformed boxes).
    """
    B, S = images_u8.shape[0], images_u8.shape[1]
    img = images_u8.astype(jnp.float32) / 255.0

    # inverse-map gather: out(x) = in((x - shift)/scale), nearest sample
    xs = jnp.arange(S, dtype=jnp.float32)
    src_x = (xs[None, :] - params.shift[:, 0:1]) / params.scale[:, None]
    src_y = (xs[None, :] - params.shift[:, 1:2]) / params.scale[:, None]
    in_x = (src_x >= 0) & (src_x <= S - 1)
    in_y = (src_y >= 0) & (src_y <= S - 1)
    ix = jnp.clip(jnp.round(src_x), 0, S - 1).astype(jnp.int32)
    iy = jnp.clip(jnp.round(src_y), 0, S - 1).astype(jnp.int32)
    # flip source x
    ix = jnp.where(params.flip[:, None], S - 1 - ix, ix)

    g = img[jnp.arange(B)[:, None, None], iy[:, :, None], ix[:, None, :]]
    valid = (in_y[:, :, None] & in_x[:, None, :])[..., None]
    g = jnp.where(valid, g, fill)

    # HSV jitter (vectorised; the reference uses uint8 LUTs, same effect)
    hsv = _rgb_to_hsv(g)
    h = (hsv[..., 0] * params.hsv[:, None, None, 0]) % 1.0
    s = jnp.clip(hsv[..., 1] * params.hsv[:, None, None, 1], 0, 1)
    v = jnp.clip(hsv[..., 2] * params.hsv[:, None, None, 2], 0, 1)
    g = _hsv_to_rgb(jnp.stack([h, s, v], axis=-1))

    # boxes: the image gather flips SOURCE coordinates (flip-then-
    # scale/shift), so boxes must flip in source space FIRST and then apply
    # the same scale+shift — flipping after placement would reflect around
    # the canvas instead of within the placed window and misalign labels.
    fx = params.flip[:, None]
    src_x1 = jnp.where(fx, S - boxes[..., 2], boxes[..., 0])
    src_x2 = jnp.where(fx, S - boxes[..., 0], boxes[..., 2])
    src = jnp.stack([src_x1, boxes[..., 1], src_x2, boxes[..., 3]], axis=-1)
    sc = params.scale[:, None, None]
    sh = params.shift[:, None, :]
    out_boxes = src * sc
    out_boxes = out_boxes.at[..., 0::2].add(sh[..., 0:1])
    out_boxes = out_boxes.at[..., 1::2].add(sh[..., 1:2])
    out_boxes = jnp.clip(out_boxes, 0, S)
    return g.astype(dtype), out_boxes
