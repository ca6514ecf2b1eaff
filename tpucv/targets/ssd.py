"""In-graph SSD target assignment.

The reference encodes targets on CPU inside the DataLoader collate
(``core/algorithms/ssd.py:327-480``: per-GT ``np.apply_along_axis`` IoU loop —
the CPU-heavy path called out in SURVEY §3.5). Here it is one vmapped jit
function over the batch: IoU matrix against all priors, threshold assignment,
best-prior-per-GT forcing, variance encoding — fully on device.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tpucv.ops.boxes import pairwise_iou


class SSDTargets(NamedTuple):
    loc: jax.Array       # (A, 4) encoded offsets (zeros for background)
    cls: jax.Array       # (A,) int32; 0 = background, 1..nc = class+1
    pos_mask: jax.Array  # (A,) bool


def encode_boxes(gt_boxes: jax.Array, priors: jax.Array,
                 variances=(0.1, 0.2)) -> jax.Array:
    """xyxy gt + xyxy priors -> (cx, cy, w, h) offset encoding
    (reference _encode_box, ssd.py:396-480)."""
    g_cxy = (gt_boxes[..., :2] + gt_boxes[..., 2:]) / 2
    g_wh = jnp.clip(gt_boxes[..., 2:] - gt_boxes[..., :2], 1e-8)
    p_cxy = (priors[..., :2] + priors[..., 2:]) / 2
    p_wh = jnp.clip(priors[..., 2:] - priors[..., :2], 1e-8)
    d_cxy = (g_cxy - p_cxy) / p_wh / variances[0]
    d_wh = jnp.log(g_wh / p_wh) / variances[1]
    return jnp.concatenate([d_cxy, d_wh], axis=-1)


def decode_boxes(loc: jax.Array, priors: jax.Array,
                 variances=(0.1, 0.2)) -> jax.Array:
    """Inverse of encode_boxes -> xyxy (reference decode path ssd.py:290-325)."""
    p_cxy = (priors[..., :2] + priors[..., 2:]) / 2
    p_wh = priors[..., 2:] - priors[..., :2]
    cxy = loc[..., :2] * variances[0] * p_wh + p_cxy
    wh = jnp.exp(loc[..., 2:] * variances[1]) * p_wh
    return jnp.concatenate([cxy - wh / 2, cxy + wh / 2], axis=-1)


def assign_ssd_targets(
    gt_boxes: jax.Array,    # (M, 4) xyxy normalised [0,1]
    gt_labels: jax.Array,   # (M,) int32 in [0, nc)
    gt_mask: jax.Array,     # (M,) bool
    priors: jax.Array,      # (A, 4) xyxy normalised
    overlap_threshold: float = 0.5,
    variances=(0.1, 0.2),
) -> SSDTargets:
    """Single-image assignment (vmap for batches).

    Semantics match the reference: a prior is positive for the best GT it
    overlaps >= threshold; every valid GT additionally claims its single best
    prior (the best-anchor fallback, ssd.py:439-470).
    """
    M = gt_boxes.shape[0]
    A = priors.shape[0]
    iou = pairwise_iou(gt_boxes, priors)                       # (M, A)
    iou = jnp.where(gt_mask[:, None], iou, -1.0)

    best_gt_per_prior = jnp.argmax(iou, axis=0)                # (A,)
    best_iou_per_prior = jnp.max(iou, axis=0)
    assigned = best_iou_per_prior >= overlap_threshold

    # force each GT's best prior; padded GT rows scatter to the
    # out-of-range index A (dropped) so they cannot race with a real GT
    # whose best prior is index 0 (their iou rows are all -1 -> argmax 0)
    best_prior_per_gt = jnp.where(
        gt_mask, jnp.argmax(iou, axis=1), A)                   # (M,)
    forced = jnp.zeros((A,), bool).at[best_prior_per_gt].set(
        True, mode="drop")
    # forced priors point at their GT regardless of threshold
    gt_of_forced = jnp.zeros((A,), jnp.int32).at[best_prior_per_gt].set(
        jnp.arange(M, dtype=jnp.int32), mode="drop")
    gt_idx = jnp.where(forced, gt_of_forced, best_gt_per_prior)
    pos = assigned | forced

    # one-hot contraction instead of (A,)-destination gathers from the
    # M-row GT table (serial on TPU; the MXU selection matmul is exact in
    # f32 — one product with 1.0 per row)
    oh = jax.nn.one_hot(gt_idx, M, dtype=jnp.float32)          # (A, M)
    tgt_boxes = oh @ gt_boxes.astype(jnp.float32)              # (A, 4)
    tgt_labels = (oh @ gt_labels.astype(jnp.float32)).astype(jnp.int32)
    loc = encode_boxes(tgt_boxes, priors, variances)
    loc = jnp.where(pos[:, None], loc, 0.0)
    cls = jnp.where(pos, tgt_labels + 1, 0).astype(jnp.int32)
    return SSDTargets(loc, cls, pos)


assign_ssd_targets_batch = jax.vmap(
    assign_ssd_targets, in_axes=(0, 0, 0, None, None, None), out_axes=0)
