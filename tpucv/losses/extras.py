"""Loss inventory extras — present in the reference but unused by its
registered models; provided at the same capability level:

  * VarifocalLoss (reference ``core/loss/ultralytics_loss.py:11-22``)
  * KeypointLoss (reference ``ultralytics_loss.py:60-71``)
  * YOLOX-style IOUloss (reference ``core/loss/iou_loss.py:5-49``)
  * MultiBox v1 per-image hard negative variant
    (reference ``core/loss/multi_box_loss.py:17-74``)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpucv.ops.boxes import bbox_iou


def varifocal_loss(pred_logits: jax.Array, gt_score: jax.Array,
                   label: jax.Array, alpha: float = 0.75,
                   gamma: float = 2.0) -> jax.Array:
    """IoU-aware classification loss (VarifocalNet)."""
    p = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    weight = alpha * jnp.power(p, gamma) * (1 - label) + gt_score * label
    bce = (jnp.clip(pred_logits, 0) - pred_logits * gt_score
           + jnp.log1p(jnp.exp(-jnp.abs(pred_logits))))
    return (bce * weight).sum()


def keypoint_loss(pred_kpts: jax.Array, gt_kpts: jax.Array,
                  kpt_mask: jax.Array, area: jax.Array,
                  sigmas: jax.Array) -> jax.Array:
    """OKS-weighted keypoint regression loss (pose task)."""
    d2 = ((pred_kpts[..., 0] - gt_kpts[..., 0]) ** 2
          + (pred_kpts[..., 1] - gt_kpts[..., 1]) ** 2)
    e = d2 / (2 * sigmas) ** 2 / (area[..., None] + 1e-9) / 2
    loss = (1 - jnp.exp(-e)) * kpt_mask
    return loss.sum() / jnp.maximum(kpt_mask.sum(), 1.0)


def iou_loss(pred: jax.Array, target: jax.Array, mode: str = "iou",
             xywh: bool = True) -> jax.Array:
    """YOLOX elementwise IoU loss: 1 - iou^2 ('iou') or 1 - giou ('giou')."""
    if mode == "giou":
        g = bbox_iou(pred, target, xywh=xywh, giou=True)
        return jnp.clip(1.0 - g, 0.0, 2.0)
    i = bbox_iou(pred, target, xywh=xywh)
    return 1.0 - i ** 2


def multibox_loss_v1(loc_pred, conf_pred, loc_true, cls_true, pos_mask,
                     neg_pos_ratio: int = 3, alpha: float = 1.0):
    """Per-image hard-negative MultiBox (the reference's v1 ranking trick:
    top (ratio * n_pos_i) negatives within each image, multi_box_loss.py:50-64).
    """
    from tpucv.losses.multibox import smooth_l1

    B, A, nc = conf_pred.shape
    conf_pred = conf_pred.astype(jnp.float32)
    n_pos_img = pos_mask.sum(axis=1)                           # (B,)
    n_pos = jnp.maximum(pos_mask.sum(), 1).astype(jnp.float32)

    l1 = smooth_l1(loc_pred.astype(jnp.float32) - loc_true).sum(-1)
    loss_loc = jnp.where(pos_mask, l1, 0.0).sum() / n_pos

    logp = jax.nn.log_softmax(conf_pred, axis=-1)
    ce = -jnp.take_along_axis(logp, cls_true[..., None], axis=-1)[..., 0]
    neg_ce = jnp.where(pos_mask, -jnp.inf, ce)
    order = jnp.argsort(-neg_ce, axis=1)
    rank = jnp.argsort(order, axis=1)                          # (B, A)
    keep_neg = rank < (neg_pos_ratio * n_pos_img)[:, None]
    loss_conf = (jnp.where(pos_mask, ce, 0.0).sum()
                 + jnp.where(keep_neg & ~pos_mask, ce, 0.0).sum()) / n_pos
    return loss_conf + alpha * loss_loc, {
        "loc_loss": loss_loc, "conf_loss": loss_conf}
