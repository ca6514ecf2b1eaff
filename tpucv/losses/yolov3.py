"""YOLOv3 loss + in-graph grid label builder.

Reference: ``core/loss/yolov3_loss.py`` — ``make_label`` builds grid targets
with triple-nested python loops per image (:9-48); the loss is BCE xy +
MSE wh + objectness with an ignore mask (best-IoU < 0.5) + BCE cls (:51-124).
Here the label builder is vectorised (scatter over GT) and jittable.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpucv.losses.common import sigmoid_bce as _bce_logits
from tpucv.ops.boxes import pairwise_iou


def make_yolov3_targets(
    gt_bboxes: jax.Array,    # (B, M, 4) xyxy px
    gt_labels: jax.Array,    # (B, M)
    gt_mask: jax.Array,      # (B, M)
    anchors: np.ndarray,     # (9, 2) px, flat
    anchor_mask: Sequence[Sequence[int]],
    strides: Sequence[int],
    feat_shapes: Sequence[Tuple[int, int]],
    nc: int,
):
    """Per level: (B, H, W, na, 5+nc) dense targets; best anchor per GT by
    wh-IoU (reference make_label best-anchor rule)."""
    B, M = gt_labels.shape
    g_cx = (gt_bboxes[..., 0] + gt_bboxes[..., 2]) / 2
    g_cy = (gt_bboxes[..., 1] + gt_bboxes[..., 3]) / 2
    g_w = gt_bboxes[..., 2] - gt_bboxes[..., 0]
    g_h = gt_bboxes[..., 3] - gt_bboxes[..., 1]

    # wh-IoU of each GT against the 9 anchors (centered)
    zeros = jnp.zeros_like(g_w)[..., None]
    gt_wh_boxes = jnp.stack(
        [-g_w / 2, -g_h / 2, g_w / 2, g_h / 2], axis=-1)       # (B, M, 4)
    anc = jnp.asarray(anchors, jnp.float32)
    anc_boxes = jnp.concatenate([-anc / 2, anc / 2], axis=-1)  # (9, 4)
    iou = pairwise_iou(gt_wh_boxes.reshape(B * M, 1, 4),
                       anc_boxes[None].repeat(B * M, 0))       # (BM, 1, 9)
    best_anchor = jnp.argmax(iou[:, 0, :], axis=-1).reshape(B, M)

    targets = []
    for l, ((H, W), s) in enumerate(zip(feat_shapes, strides)):
        mask_ids = jnp.asarray(list(anchor_mask[l]))
        na = len(anchor_mask[l])
        in_level = jnp.isin(best_anchor, mask_ids) & gt_mask & (g_w > 0)
        a_local = jnp.argmax(
            best_anchor[..., None] == mask_ids[None, None, :], axis=-1)
        cx = jnp.clip(jnp.floor(g_cx / s), 0, W - 1).astype(jnp.int32)
        cy = jnp.clip(jnp.floor(g_cy / s), 0, H - 1).astype(jnp.int32)
        t = jnp.zeros((B, H, W, na, 5 + nc), jnp.float32)
        bb = jnp.arange(B)[:, None].repeat(M, 1)
        vals = jnp.stack([
            g_cx / s - cx, g_cy / s - cy,            # xy offset in cell
            jnp.log(jnp.maximum(g_w, 1e-6)
                    / jnp.maximum(anc[mask_ids][a_local][..., 0], 1e-6)),
            jnp.log(jnp.maximum(g_h, 1e-6)
                    / jnp.maximum(anc[mask_ids][a_local][..., 1], 1e-6)),
            jnp.ones_like(g_w),
        ], axis=-1)
        onehot = jax.nn.one_hot(jnp.clip(gt_labels, 0, nc - 1), nc)
        full = jnp.concatenate([vals, onehot], axis=-1)        # (B, M, 5+nc)
        cy_w = jnp.where(in_level, cy, H)                       # drop via oob
        t = t.at[bb, cy_w, cx, a_local].set(full, mode="drop")
        targets.append(t)
    return targets


def yolov3_loss(
    raw_maps: Sequence[jax.Array],
    gt_bboxes: jax.Array,
    gt_labels: jax.Array,
    gt_mask: jax.Array,
    anchors: np.ndarray,            # (9, 2)
    anchor_mask: Sequence[Sequence[int]],
    strides: Sequence[int],
    nc: int,
    ignore_threshold: float = 0.5,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    B = raw_maps[0].shape[0]
    feat_shapes = [m.shape[1:3] for m in raw_maps]
    targets = make_yolov3_targets(
        gt_bboxes, gt_labels, gt_mask, anchors, anchor_mask, strides,
        feat_shapes, nc)

    total_xy = total_wh = total_obj = total_cls = 0.0
    for l, (m, t, s) in enumerate(zip(raw_maps, targets, strides)):
        na = t.shape[3]
        H, W = t.shape[1:3]
        p = m.reshape(B, H, W, na, 5 + nc).astype(jnp.float32)
        obj_t = t[..., 4]
        pos = obj_t > 0.5
        n_pos = jnp.maximum(pos.sum(), 1.0)

        # xy BCE, wh MSE on positives
        xy_bce = _bce_logits(p[..., :2], t[..., :2]).sum(-1)
        wh_mse = jnp.square(p[..., 2:4] - t[..., 2:4]).sum(-1)
        total_xy += jnp.where(pos, xy_bce, 0.0).sum() / n_pos
        total_wh += jnp.where(pos, wh_mse, 0.0).sum() / n_pos

        # decoded boxes for the ignore mask
        mask_ids = list(anchor_mask[l])
        anc = jnp.asarray(anchors, jnp.float32)[jnp.asarray(mask_ids)]
        gy, gx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                              jnp.arange(W, dtype=jnp.float32), indexing="ij")
        px = (jax.nn.sigmoid(p[..., 0]) + gx[None, :, :, None]) * s
        py = (jax.nn.sigmoid(p[..., 1]) + gy[None, :, :, None]) * s
        pw = jnp.exp(jnp.clip(p[..., 2], -10, 10)) * anc[None, None, None, :, 0]
        ph = jnp.exp(jnp.clip(p[..., 3], -10, 10)) * anc[None, None, None, :, 1]
        pred_boxes = jnp.stack(
            [px - pw / 2, py - ph / 2, px + pw / 2, py + ph / 2], axis=-1)
        flat = pred_boxes.reshape(B, -1, 4)
        best_iou = pairwise_iou(flat, gt_bboxes).max(-1)        # vs all gts
        best_iou = jnp.where(gt_mask.any(-1)[:, None], best_iou, 0.0)
        ignore = (best_iou.reshape(B, H, W, na) > ignore_threshold) & ~pos

        obj_bce = _bce_logits(p[..., 4], obj_t)
        total_obj += jnp.where(ignore, 0.0, obj_bce).sum() / (B * H * W * na)
        cls_bce = _bce_logits(p[..., 5:], t[..., 5:]).sum(-1)
        total_cls += jnp.where(pos, cls_bce, 0.0).sum() / n_pos

    total = total_xy + total_wh + total_obj + total_cls
    return total, {"xy_loss": total_xy, "wh_loss": total_wh,
                   "obj_loss": total_obj, "cls_loss": total_cls}



