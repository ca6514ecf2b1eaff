"""YOLOv8 instance-segmentation loss — detection loss + per-instance mask
BCE, fully static shapes.

No torch reference exists (the reference repo has no instance-seg task);
semantics follow ultralytics v8-seg: each foreground anchor's predicted
mask (sigmoid of its coefficient vector against the prototypes) is trained
with BCE against the ASSIGNED GT's instance mask, cropped to the GT box and
normalised by the box area.

TPU-native shape strategy: computing (B, A, Hm, Wm) mask maps for all 8400
anchors is prohibitive; instead the top ``mask_topk`` foreground anchors
per image (by assignment weight) are selected with a static K —
coefficient gathers have a SMALL destination (fine on TPU), while the GT
mask pick is a one-hot contraction over the M axis on the MXU.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from tpucv.losses.common import sigmoid_bce
from tpucv.losses.yolov8 import yolov8_loss


def yolov8_seg_loss(
    raw: Tuple,
    gt_labels: jax.Array,        # (B, M)
    gt_bboxes: jax.Array,        # (B, M, 4) xyxy px
    gt_mask: jax.Array,          # (B, M)
    gt_inst_masks: jax.Array,    # (B, M, Hm, Wm) {0,1} at proto resolution
    nc: int = 80,
    reg_max: int = 16,
    strides: Sequence[int] = (8, 16, 32),
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
    mask_gain: float = 2.5,
    tal_topk: int = 10,
    mask_topk: int = 64,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    det_maps, coef_maps, protos = raw
    B = det_maps[0].shape[0]
    Hm, Wm = protos.shape[1:3]
    nm = protos.shape[-1]
    # input pixels per axis (NHWC maps: shape[1]=H, shape[2]=W) — keep the
    # axes separate so rectangular inputs crop against the right region
    Sh = strides[0] * det_maps[0].shape[1]
    Sw = strides[0] * det_maps[0].shape[2]

    det_total, metrics, aux = yolov8_loss(
        det_maps, gt_labels, gt_bboxes, gt_mask, nc=nc, reg_max=reg_max,
        strides=strides, box_gain=box_gain, cls_gain=cls_gain,
        dfl_gain=dfl_gain, tal_topk=tal_topk, return_aux=True)

    # flatten mask coefficients to (B, A, nm), matching the det-map order
    coefs = jnp.concatenate(
        [m.reshape(B, -1, nm) for m in coef_maps], axis=1)

    # static top-K foreground anchors by assignment weight
    K = min(mask_topk, coefs.shape[1])
    score = jnp.where(aux["fg"], aux["weight"], -1.0)           # (B, A)
    top_w, top_idx = jax.lax.top_k(score, K)                    # (B, K)
    valid = top_w > 0.0

    sel_coefs = jnp.take_along_axis(
        coefs.astype(jnp.float32), top_idx[..., None], axis=1)  # (B, K, nm)
    sel_gt = jnp.take_along_axis(aux["gt_idx"], top_idx, axis=1)
    sel_boxes = jnp.take_along_axis(
        aux["target_bboxes_px"].astype(jnp.float32),
        top_idx[..., None], axis=1)                             # (B, K, 4) px

    # predicted mask logits for the K anchors (MXU contraction)
    pred = jnp.einsum("bkn,bhwn->bkhw", sel_coefs,
                      protos.astype(jnp.float32))               # (B,K,Hm,Wm)

    # assigned GT instance masks via one-hot over the small M axis
    onehot = jax.nn.one_hot(sel_gt, gt_inst_masks.shape[1],
                            dtype=jnp.float32)                  # (B, K, M)
    tgt = jnp.einsum("bkm,bmhw->bkhw", onehot,
                     gt_inst_masks.astype(jnp.float32))

    bce = sigmoid_bce(pred, tgt)                                # (B,K,Hm,Wm)

    # crop to the assigned box at proto resolution; normalise by box area
    bx = sel_boxes * jnp.asarray([Wm / Sw, Hm / Sh, Wm / Sw, Hm / Sh])
    cx = jnp.arange(Wm, dtype=jnp.float32)[None, None, None, :]
    cy = jnp.arange(Hm, dtype=jnp.float32)[None, None, :, None]
    x1, y1, x2, y2 = (bx[..., i][..., None, None] for i in range(4))
    inside = (cx >= x1) & (cx < x2) & (cy >= y1) & (cy < y2)
    area = jnp.clip((x2 - x1) * (y2 - y1), 1.0)[..., 0, 0]      # (B, K)
    per_anchor = jnp.where(inside, bce, 0.0).sum((-2, -1)) / area
    n_valid = jnp.maximum(valid.sum(dtype=jnp.float32), 1.0)
    loss_mask = jnp.where(valid, per_anchor, 0.0).sum() / n_valid

    total = det_total + mask_gain * loss_mask * B
    metrics = dict(metrics)
    metrics["mask_loss"] = loss_mask
    return total, metrics
