"""YOLOv8 detection loss: TAL assignment + BCE cls + CIoU + DFL.

Functional re-design of the reference ``Loss`` (core/algorithms/yolo_v8.py:25-124)
and ``BboxLoss`` (core/loss/ultralytics_loss.py:25-57). Targets arrive as
*padded, fixed-shape* (B, M, 5) [class, x1, y1, x2, y2 pixels] + mask — no
collate-time ragged concat as in the reference's ``preprocess``
(yolo_v8.py:51-65); padding is produced by the dataset.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from tpucv.nn.heads import dfl_project
from tpucv.ops.anchors import make_anchors
from tpucv.ops.boxes import bbox2dist, bbox_iou, dist2bbox
from tpucv.losses.common import sigmoid_bce
from tpucv.losses.tal import task_aligned_assigner


def _df_loss(pred_dist: jax.Array, target: jax.Array) -> jax.Array:
    """Distribution focal loss (reference ultralytics_loss.py:49-57).

    pred_dist: (..., 4, reg_max) logits; target: (..., 4) continuous in
    [0, reg_max-1]. Returns (...,) mean over the 4 sides.

    Same math as the reference's two-sided cross entropy, restructured for
    the TPU: with wl + wr = 1,
        -(logp[tl]*wl + logp[tr]*wr) = logsumexp(x) - (x[tl]*wl + x[tr]*wr)
    and the two weighted one-hot picks are exactly the linear hat
    sum_j x_j * relu(1 - |t - j|) — one (..., reg_max) pass instead of a
    log_softmax materialisation plus two one-hot contractions (DFL fwd+bwd
    was the most expensive loss term at 640^2, see docs/performance.md).
    """
    reg_max = pred_dist.shape[-1]
    j = jnp.arange(reg_max, dtype=target.dtype)
    hat = jnp.maximum(1.0 - jnp.abs(target[..., None] - j), 0.0)
    pick = jnp.sum(pred_dist * hat, axis=-1)
    lse = jax.nn.logsumexp(pred_dist, axis=-1)
    return (lse - pick).mean(axis=-1)


def yolov8_loss(
    raw_maps: Sequence[jax.Array],
    gt_labels: jax.Array,
    gt_bboxes: jax.Array,
    gt_mask: jax.Array,
    nc: int = 80,
    reg_max: int = 16,
    strides: Sequence[int] = (8, 16, 32),
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
    tal_topk: int = 10,
    return_aux: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Compute the YOLOv8 training loss.

    Args:
      raw_maps: per-level (B, H, W, 4*reg_max+nc) raw head outputs.
      gt_labels: (B, M) int32; gt_bboxes: (B, M, 4) xyxy in input pixels;
      gt_mask: (B, M) bool.
    Returns:
      (scalar total loss, dict of unweighted components) — total is scaled by
      batch size like the reference (yolo_v8.py:122-124).
    """
    B = raw_maps[0].shape[0]
    feat_shapes = [m.shape[1:3] for m in raw_maps]
    anchor_points, stride_arr = make_anchors(feat_shapes, strides)  # (A,2),(A,1)

    # On TPU the big (B, A, *) tensors stay bf16 (the raw maps already are)
    # and only reductions accumulate in f32 — the loss costs ~30% of a train
    # step and is HBM-bandwidth-bound. CPU keeps f32 end-to-end so the
    # golden value tests against the torch reference stay exact.
    cdt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    flat = [m.reshape(B, -1, m.shape[-1]) for m in raw_maps]
    x = jnp.concatenate(flat, axis=1).astype(cdt)             # (B, A, no)
    pred_dist_logits = x[..., : 4 * reg_max]                  # (B, A, 64)
    pred_cls_logits = x[..., 4 * reg_max:]                    # (B, A, nc)
    pred_scores = jax.nn.sigmoid(pred_cls_logits)

    # decode boxes at feature scale (grid units), like reference bbox_decode.
    # The small (B, A, 4) geometry stays f32: bf16 coords at ~80 grid units
    # would quantise to ~0.25 cells and poison the CIoU gradient.
    dist = dfl_project(pred_dist_logits, reg_max).astype(jnp.float32)
    pred_bboxes = dist2bbox(dist, anchor_points[None])        # (B, A, 4) grid units

    # assigner works in pixel units (reference yolo_v8.py:96-104)
    assigned = task_aligned_assigner(
        jax.lax.stop_gradient(pred_scores),
        jax.lax.stop_gradient(pred_bboxes * stride_arr[None]),
        anchor_points * stride_arr,
        gt_labels, gt_bboxes, gt_mask,
        topk=tal_topk, num_classes=nc,
    )
    target_bboxes = (assigned.target_bboxes.astype(jnp.float32)
                     / stride_arr[None])                       # grid units
    target_scores = assigned.target_scores
    fg = assigned.fg_mask
    tss = jnp.maximum(target_scores.sum(dtype=jnp.float32), 1.0)

    # cls: BCE with soft targets, sum / target_scores_sum (yolo_v8.py:108-109)
    # — elementwise in the compute dtype, accumulated in f32
    bce = sigmoid_bce(pred_cls_logits, target_scores.astype(cdt))
    loss_cls = bce.sum(dtype=jnp.float32) / tss

    # box: CIoU weighted by anchor target-score weight (ultralytics_loss.py:36-40)
    weight = target_scores.sum(-1, dtype=jnp.float32)          # (B, A)
    iou = bbox_iou(pred_bboxes, target_bboxes, xywh=False, ciou=True)
    loss_box = (jnp.where(fg, (1.0 - iou) * weight, 0.0)
                ).sum(dtype=jnp.float32) / tss

    # dfl (ultralytics_loss.py:42-48)
    target_ltrb = bbox2dist(target_bboxes, anchor_points[None], reg_max - 1)
    df = _df_loss(pred_dist_logits.reshape(B, -1, 4, reg_max), target_ltrb)
    loss_dfl = (jnp.where(fg, df.astype(jnp.float32) * weight, 0.0)
                ).sum(dtype=jnp.float32) / tss

    total = (box_gain * loss_box + cls_gain * loss_cls + dfl_gain * loss_dfl) * B
    metrics = {
        "box_loss": loss_box, "cls_loss": loss_cls, "dfl_loss": loss_dfl,
        "num_fg": fg.sum().astype(jnp.float32),
    }
    if return_aux:
        # assignment facts for composed heads (segmentation mask loss):
        # fg anchors, their GT rows, per-anchor weights, the normaliser,
        # and the assigned boxes in input pixels
        aux = {"fg": fg, "gt_idx": assigned.target_gt_idx, "weight": weight,
               "tss": tss, "target_bboxes_px": assigned.target_bboxes}
        return total, metrics, aux
    return total, metrics


# canonical implementation lives in losses/common.py
optax_sigmoid_bce = sigmoid_bce
