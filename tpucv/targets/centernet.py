"""CenterNet gaussian-heatmap targets, fully in-graph.

The reference splats gaussians per sample with numpy in collate workers
(``core/algorithms/centernet.py:66-110`` + ``core/utils/gaussian.py``). Here
the splat is a vectorised ``segment_max`` over (batch*box) full-grid gaussians
— one jittable function, runs on device, no host loop (SURVEY §7.3 hard part
5: scatter-max with variable radius under jit).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def gaussian_radius(det_size: Tuple[jax.Array, jax.Array],
                    min_overlap: float = 0.7) -> jax.Array:
    """Three-case min radius (reference gaussian.py:4-24), vectorised."""
    h, w = det_size
    a1 = 1.0
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1**2 - 4 * a1 * c1, 0))
    r1 = (b1 + sq1) / 2

    a2 = 4.0
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    sq2 = jnp.sqrt(jnp.maximum(b2**2 - 4 * a2 * c2, 0))
    r2 = (b2 + sq2) / 2

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    sq3 = jnp.sqrt(jnp.maximum(b3**2 - 4 * a3 * c3, 0))
    # NOTE: (b3+sq3)/2, not /(2*a3) — reproduces the reference (and original
    # CenterNet repo) exactly, which uses this widely-known non-quadratic
    # division (gaussian.py:21); r3 is usually the min, so the "fixed"
    # formula would shrink every radius ~2.8x vs the published training.
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


class CenterNetTargets(NamedTuple):
    heatmap: jax.Array   # (B, H, W, C) in [0,1]
    ind: jax.Array       # (B, M) int32 flat y*W+x of centres
    wh: jax.Array        # (B, M, 2) box size in feature units
    reg: jax.Array       # (B, M, 2) centre sub-pixel offset
    mask: jax.Array      # (B, M) bool


def build_centernet_targets(
    gt_boxes: jax.Array,    # (B, M, 4) xyxy input pixels
    gt_labels: jax.Array,   # (B, M) int32
    gt_mask: jax.Array,     # (B, M) bool
    num_classes: int,
    output_size: Tuple[int, int],
    downsample: int = 4,
) -> CenterNetTargets:
    B, M = gt_labels.shape
    H, W = output_size
    boxes = gt_boxes / downsample
    cx = (boxes[..., 0] + boxes[..., 2]) / 2
    cy = (boxes[..., 1] + boxes[..., 3]) / 2
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cxi = jnp.clip(jnp.floor(cx), 0, W - 1)
    cyi = jnp.clip(jnp.floor(cy), 0, H - 1)

    radius = jnp.maximum(jnp.floor(gaussian_radius((h, w))), 0)  # (B, M)
    sigma = (2 * radius + 1) / 6.0

    # full-grid gaussians (B, M, H, W)
    ys = jnp.arange(H, dtype=jnp.float32)[None, None, :, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, None, :]
    d2 = (xs - cxi[..., None, None])**2 + (ys - cyi[..., None, None])**2
    g = jnp.exp(-d2 / (2 * jnp.maximum(sigma, 1e-6)[..., None, None]**2))
    # outside the radius window the reference writes nothing
    win = (jnp.abs(xs - cxi[..., None, None]) <= radius[..., None, None]) & \
          (jnp.abs(ys - cyi[..., None, None]) <= radius[..., None, None])
    valid = gt_mask & (w > 0) & (h > 0)
    g = jnp.where(win & valid[..., None, None], g, 0.0)

    # scatter-max into class channels via segment_max over (B*M) maps
    seg_ids = (jnp.arange(B)[:, None] * num_classes
               + jnp.clip(gt_labels, 0, num_classes - 1)).reshape(-1)
    heat = jax.ops.segment_max(
        g.reshape(B * M, H, W), seg_ids, num_segments=B * num_classes)
    heat = jnp.maximum(heat, 0.0).reshape(B, num_classes, H, W)
    heatmap = jnp.transpose(heat, (0, 2, 3, 1))

    ind = (cyi * W + cxi).astype(jnp.int32)
    wh = jnp.stack([w, h], axis=-1)
    reg = jnp.stack([cx - cxi, cy - cyi], axis=-1)
    return CenterNetTargets(heatmap, ind, wh, reg, valid)
