"""YOLOv8-pose loss — detection loss + OKS keypoint regression + keypoint
visibility BCE, static shapes (no reference counterpart: the torch repo's
pose work is an unfinished CPM file with no pipeline).

Semantics follow ultralytics v8-pose: on each foreground anchor, the
predicted keypoints (decoded relative to the anchor cell) regress to the
assigned GT's keypoints with the OKS-weighted loss (area-normalised), and
the visibility channel trains with BCE against kpt-visibility > 0.  Shape
strategy mirrors yolov8_seg: a static top-K of foreground anchors; GT
keypoint pick is a one-hot MXU contraction over the M axis.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from tpucv.losses.common import sigmoid_bce
from tpucv.losses.extras import keypoint_loss
from tpucv.losses.yolov8 import yolov8_loss
from tpucv.ops.anchors import make_anchors

# COCO 17-keypoint OKS sigmas (pycocotools / ultralytics constant)
# one canonical copy of the 17-keypoint OKS sigma table (pycocotools'),
# shared with the eval engine so loss and metric can't drift apart
from tpucv.metrics.coco_map import OKS_SIGMAS

OKS_SIGMA_17 = OKS_SIGMAS.astype(np.float32)


def decode_kpts_flat(kpt_maps: Sequence[jax.Array], kpt_shape,
                     strides: Sequence[int]):
    """Per-level kpt maps -> (B, A, nk, 3): xy in input pixels (decoded
    ultralytics-style: k*2 + anchor - 0.5, times stride), raw visibility
    logit in channel 2."""
    B = kpt_maps[0].shape[0]
    nk = kpt_shape[0]
    feat_shapes = [m.shape[1:3] for m in kpt_maps]
    anc, stride_arr = make_anchors(feat_shapes, strides)     # grid units
    flat = jnp.concatenate(
        [m.reshape(B, -1, nk, kpt_shape[1]) for m in kpt_maps],
        axis=1).astype(jnp.float32)                          # (B, A, nk, 3)
    x = (flat[..., 0] * 2.0 + (anc[None, :, None, 0] - 0.5)) \
        * stride_arr[None, :, 0, None]
    y = (flat[..., 1] * 2.0 + (anc[None, :, None, 1] - 0.5)) \
        * stride_arr[None, :, 0, None]
    return jnp.stack([x, y, flat[..., 2]], axis=-1)


def yolov8_pose_loss(
    raw: Tuple,
    gt_labels: jax.Array,        # (B, M)
    gt_bboxes: jax.Array,        # (B, M, 4) xyxy px
    gt_mask: jax.Array,          # (B, M)
    gt_kpts: jax.Array,          # (B, M, nk, 3) px xy + visibility {0,1,2}
    nc: int = 1,
    reg_max: int = 16,
    strides: Sequence[int] = (8, 16, 32),
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
    kpt_gain: float = 12.0,
    kobj_gain: float = 1.0,
    tal_topk: int = 10,
    pose_topk: int = 64,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    det_maps, kpt_maps = raw
    B = det_maps[0].shape[0]
    nk = gt_kpts.shape[2]

    det_total, metrics, aux = yolov8_loss(
        det_maps, gt_labels, gt_bboxes, gt_mask, nc=nc, reg_max=reg_max,
        strides=strides, box_gain=box_gain, cls_gain=cls_gain,
        dfl_gain=dfl_gain, tal_topk=tal_topk, return_aux=True)

    pred_kpts = decode_kpts_flat(kpt_maps, (nk, 3), strides)  # (B, A, nk, 3)

    K = min(pose_topk, pred_kpts.shape[1])
    score = jnp.where(aux["fg"], aux["weight"], -1.0)
    top_w, top_idx = jax.lax.top_k(score, K)
    valid = top_w > 0.0                                       # (B, K)

    sel_pred = jnp.take_along_axis(
        pred_kpts, top_idx[..., None, None], axis=1)          # (B, K, nk, 3)
    sel_gt_idx = jnp.take_along_axis(aux["gt_idx"], top_idx, axis=1)
    sel_boxes = jnp.take_along_axis(
        aux["target_bboxes_px"].astype(jnp.float32),
        top_idx[..., None], axis=1)

    onehot = jax.nn.one_hot(sel_gt_idx, gt_kpts.shape[1],
                            dtype=jnp.float32)                # (B, K, M)
    tgt = jnp.einsum("bkm,bmnc->bknc", onehot,
                     gt_kpts.astype(jnp.float32))             # (B, K, nk, 3)

    area = jnp.clip(
        (sel_boxes[..., 2] - sel_boxes[..., 0])
        * (sel_boxes[..., 3] - sel_boxes[..., 1]), 1.0)       # (B, K)
    vis = (tgt[..., 2] > 0) & valid[..., None]                # (B, K, nk)
    sigmas = jnp.asarray(OKS_SIGMA_17 if nk == 17
                         else np.full(nk, 1.0 / nk, np.float32))
    loss_kpt = keypoint_loss(sel_pred[..., :2], tgt[..., :2],
                             vis.astype(jnp.float32), area, sigmas)

    kobj_bce = sigmoid_bce(sel_pred[..., 2],
                           vis.astype(jnp.float32))           # (B, K, nk)
    n_valid = jnp.maximum(valid.sum(dtype=jnp.float32) * nk, 1.0)
    loss_kobj = jnp.where(valid[..., None], kobj_bce, 0.0).sum() / n_valid

    total = det_total + (kpt_gain * loss_kpt + kobj_gain * loss_kobj) * B
    metrics = dict(metrics)
    metrics["kpt_loss"] = loss_kpt
    metrics["kobj_loss"] = loss_kobj
    return total, metrics
