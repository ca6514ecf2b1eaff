"""CenterNet decode: heatmap peaks -> boxes (reference
``core/algorithms/centernet.py:271-338``): sigmoid -> 3x3 maxpool peak
suppression (_suppress_redundant_centers :316-326) -> top-K (_top_k :328-338)
-> gather wh/reg -> optional DIoU-NMS. Static shapes, lax.top_k, jit-able."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tpucv.nn.blocks import max_pool_same
from tpucv.ops.nms import nms


def decode_centernet(
    output: jax.Array,        # (B, H, W, C+4)
    num_classes: int,
    downsample: int = 4,
    K: int = 100,
    conf_threshold: float = 0.1,
    use_diou_nms: bool = True,
    iou_threshold: float = 0.5,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    B, H, W, _ = output.shape
    hm = jax.nn.sigmoid(output[..., :num_classes].astype(jnp.float32))
    # slice convention matches the reference decode (centernet.py:274-276):
    # offsets at [C:C+2], sizes at [-2:]
    reg = output[..., num_classes:num_classes + 2].astype(jnp.float32)
    wh = output[..., num_classes + 2:num_classes + 4].astype(jnp.float32)

    # peak suppression: keep only local 3x3 maxima
    peak = max_pool_same(hm, 3)
    hm = jnp.where(jnp.abs(peak - hm) < 1e-6, hm, 0.0)

    # top-K over flattened (H*W*C)
    flat = hm.reshape(B, -1)
    scores, idx = jax.lax.top_k(flat, K)                 # (B, K)
    cls = (idx % num_classes).astype(jnp.int32)
    pos = idx // num_classes
    ys = (pos // W).astype(jnp.float32)
    xs = (pos % W).astype(jnp.float32)

    flat_pos = pos                                        # (B, K) in H*W
    wh_flat = wh.reshape(B, -1, 2)
    reg_flat = reg.reshape(B, -1, 2)
    # broadcast (B, K, 1) index — a repeated index tensor lowers the gather
    # to scalar granularity on TPU (scripts/probe_gather.py)
    wh_k = jnp.take_along_axis(wh_flat, flat_pos[..., None], 1)
    reg_k = jnp.take_along_axis(reg_flat, flat_pos[..., None], 1)

    cx = (xs + reg_k[..., 0]) * downsample
    cy = (ys + reg_k[..., 1]) * downsample
    bw = wh_k[..., 0] * downsample
    bh = wh_k[..., 1] * downsample
    boxes = jnp.stack(
        [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=-1)
    valid = scores > conf_threshold

    if use_diou_nms:
        def one(b, s, v):
            keep_idx, keep_valid = nms(b, jnp.where(v, s, 0.0),
                                       iou_threshold, K, diou=True)
            return (b[keep_idx], jnp.where(keep_valid, s[keep_idx], 0.0),
                    keep_idx, keep_valid & (s[keep_idx] > conf_threshold))
        boxes2, scores2, keep_idx, valid2 = jax.vmap(one)(boxes, scores, valid)
        cls = jnp.take_along_axis(cls, keep_idx, axis=1)
        return boxes2, scores2, cls, valid2
    return boxes, jnp.where(valid, scores, 0.0), cls, valid
