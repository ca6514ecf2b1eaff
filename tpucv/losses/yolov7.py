"""YOLOv7 OTA loss — vectorised simOTA with static shapes.

Re-design of the reference ``Yolo7Loss`` (``core/loss/yolo7_loss.py``):
``find_3_positive`` 5-offset grid candidates (:340-443), pairwise IoU+cls cost
matrix with dynamic-k top-k per GT and conflict resolution (:129-338), then
CIoU box + BCE obj(iou target) + BCE cls with per-layer balance (:38-127).

The reference is per-image python loops over data-dependent candidate sets
(SURVEY §7.3 hard part 2). Here every GT owns a *static* candidate slate —
3 cells x na anchors x nl layers = 27 — masked for validity; dynamic-k
becomes a rank-vs-k comparison; conflicts resolve by per-anchor cost argmin
via scatter-min. No host sync, one XLA graph.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpucv.losses.common import sigmoid_bce as _bce_logits
from tpucv.ops.boxes import bbox_iou


def _flat_geometry(feat_shapes, strides, anchors):
    """Per flat-prediction constants: cell xy, anchor wh, stride, layer id."""
    cxs, cys, aws, ahs, sts, lids, offs = [], [], [], [], [], [], [0]
    na = anchors.shape[1]
    for l, ((h, w), s) in enumerate(zip(feat_shapes, strides)):
        gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        for arrs, vals in ((cxs, gx), (cys, gy)):
            arrs.append(np.repeat(vals.reshape(-1), na))
        aw = np.tile(anchors[l, :, 0], h * w)
        ah = np.tile(anchors[l, :, 1], h * w)
        aws.append(aw)
        ahs.append(ah)
        sts.append(np.full(h * w * na, s, np.float32))
        lids.append(np.full(h * w * na, l, np.int32))
        offs.append(offs[-1] + h * w * na)
    return (jnp.asarray(np.concatenate(cxs), jnp.float32),
            jnp.asarray(np.concatenate(cys), jnp.float32),
            jnp.asarray(np.concatenate(aws), jnp.float32),
            jnp.asarray(np.concatenate(ahs), jnp.float32),
            jnp.asarray(np.concatenate(sts)),
            jnp.asarray(np.concatenate(lids)),
            offs[:-1])


def yolov7_loss(
    raw_maps: Sequence[jax.Array],
    gt_bboxes: jax.Array,      # (B, M, 4) xyxy px
    gt_labels: jax.Array,      # (B, M)
    gt_mask: jax.Array,        # (B, M)
    anchors: np.ndarray,       # (nl, na, 2) px
    strides: Sequence[int] = (8, 16, 32),
    nc: int = 20,
    box_gain: float = 0.05,
    obj_gain: float = 0.7,
    cls_gain: float = 0.3,
    layer_balance: Sequence[float] = (4.0, 1.0, 0.4),
    anchor_t: float = 4.0,
    max_dynamic_k: int = 20,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    B = raw_maps[0].shape[0]
    nl = len(raw_maps)
    na = anchors.shape[1]
    feat_shapes = [m.shape[1:3] for m in raw_maps]
    cx, cy, aw, ah, st, lid, offs = _flat_geometry(
        feat_shapes, strides, anchors)
    A = cx.shape[0]

    # flatten predictions (B, A, 5+nc). On TPU the wide logit tensor stays
    # bf16 (matching the raw maps) and reductions accumulate f32; box
    # geometry is f32 throughout — bf16 coords at pixel scale would poison
    # the CIoU gradient. CPU keeps f32 end-to-end so the golden value tests
    # against the torch reference stay exact (same recipe as yolov8.py).
    cdt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    preds = jnp.concatenate(
        [m.reshape(B, -1, na, 5 + nc).reshape(B, -1, 5 + nc)
         for m in raw_maps], axis=1).astype(cdt)

    # decoded boxes for every anchor (needed at matched positions)
    sig = jax.nn.sigmoid(preds[..., :4].astype(jnp.float32))
    px = (sig[..., 0] * 2.0 - 0.5 + cx[None]) * st[None]
    py = (sig[..., 1] * 2.0 - 0.5 + cy[None]) * st[None]
    pw = (sig[..., 2] * 2.0) ** 2 * aw[None]
    ph = (sig[..., 3] * 2.0) ** 2 * ah[None]
    pred_boxes = jnp.stack(
        [px - pw / 2, py - ph / 2, px + pw / 2, py + ph / 2], axis=-1)

    # ---------------- candidate slate: (B, M, nl*3*na) flat indices --------
    M = gt_labels.shape[1]
    g_cx = (gt_bboxes[..., 0] + gt_bboxes[..., 2]) / 2
    g_cy = (gt_bboxes[..., 1] + gt_bboxes[..., 3]) / 2
    g_w = gt_bboxes[..., 2] - gt_bboxes[..., 0]
    g_h = gt_bboxes[..., 3] - gt_bboxes[..., 1]

    cand_flat, cand_valid = [], []
    for l, ((H, W), s) in enumerate(zip(feat_shapes, strides)):
        gx = g_cx / s
        gy = g_cy / s
        cxi = jnp.floor(gx)
        cyi = jnp.floor(gy)
        # neighbour offsets by fractional part (reference :340-443)
        dx = jnp.where(gx - cxi < 0.5, -1.0, 1.0)
        dy = jnp.where(gy - cyi < 0.5, -1.0, 1.0)
        cells = [(cxi, cyi), (cxi + dx, cyi), (cxi, cyi + dy)]
        for (ccx, ccy) in cells:
            in_bounds = (ccx >= 0) & (ccx < W) & (ccy >= 0) & (ccy < H)
            ccxc = jnp.clip(ccx, 0, W - 1)
            ccyc = jnp.clip(ccy, 0, H - 1)
            for a in range(na):
                r_w = g_w / (anchors[l, a, 0] + 1e-9)
                r_h = g_h / (anchors[l, a, 1] + 1e-9)
                ratio_ok = jnp.maximum(
                    jnp.maximum(r_w, 1 / (r_w + 1e-9)),
                    jnp.maximum(r_h, 1 / (r_h + 1e-9))) < anchor_t
                flat = (offs[l] + (ccyc * W + ccxc) * na + a).astype(jnp.int32)
                cand_flat.append(flat)
                cand_valid.append(in_bounds & ratio_ok & gt_mask)
    cand_flat = jnp.stack(cand_flat, axis=-1)       # (B, M, K)
    cand_valid = jnp.stack(cand_valid, axis=-1)     # (B, M, K)
    K = cand_flat.shape[-1]

    # ---------------- cost matrix over candidates --------------------------
    # broadcast (B, M*K, 1) index: XLA row-gathers the full channel vector.
    # A fully-materialised repeated index tensor makes the gather
    # scalar-granular and serial on TPU — 34.7 vs 2.2 ms at this shape
    # (scripts/probe_gather.py).
    cand_boxes = jnp.take_along_axis(
        pred_boxes, cand_flat.reshape(B, M * K)[..., None],
        axis=1).reshape(B, M, K, 4)
    iou = bbox_iou(gt_bboxes[:, :, None, :], cand_boxes, xywh=False,
                   ciou=False)
    iou = jnp.clip(iou, 0.0, 1.0)
    cand_preds = jnp.take_along_axis(
        preds, cand_flat.reshape(B, M * K)[..., None],
        axis=1).reshape(B, M, K, 5 + nc)
    p_obj = jax.nn.sigmoid(cand_preds[..., 4:5].astype(jnp.float32))
    p_cls = jax.nn.sigmoid(cand_preds[..., 5:].astype(jnp.float32)) * p_obj
    onehot = jax.nn.one_hot(jnp.clip(gt_labels, 0, nc - 1), nc)
    y = jnp.sqrt(jnp.clip(p_cls, 1e-8, 1.0))
    bce = -(onehot[:, :, None, :] * jnp.log(y)
            + (1 - onehot[:, :, None, :]) * jnp.log(jnp.clip(1 - y, 1e-8)))
    cls_cost = bce.sum(-1)
    iou_cost = -jnp.log(iou + 1e-8)
    cost = cls_cost + 3.0 * iou_cost + 1e5 * (~cand_valid)

    # ---------------- dynamic-k selection ---------------------------------
    topk_iou, _ = jax.lax.top_k(jnp.where(cand_valid, iou, 0.0),
                                min(max_dynamic_k, K))
    dyn_k = jnp.clip(topk_iou.sum(-1).astype(jnp.int32), 1, max_dynamic_k)
    order = jnp.argsort(cost, axis=-1)                       # ascending
    rank = jnp.argsort(order, axis=-1)
    selected = (rank < dyn_k[..., None]) & cand_valid        # (B, M, K)

    # ---------------- conflict resolution (per-anchor min cost) ------------
    flat_bmk = cand_flat.reshape(B, M * K)
    cost_bmk = jnp.where(selected, cost, 1e9).reshape(B, M * K)
    best_cost = jnp.full((B, A), 1e9).at[
        jnp.arange(B)[:, None], flat_bmk].min(cost_bmk)
    final = selected & (
        cost <= best_cost[jnp.arange(B)[:, None], flat_bmk].reshape(B, M, K)
        + 1e-6)

    # scatter targets to flat anchors; later writes are conflict-free
    dump = A  # out-of-range index dropped by mode="drop"
    w_idx = jnp.where(final.reshape(B, M * K), flat_bmk, dump)
    matched = jnp.zeros((B, A), bool).at[
        jnp.arange(B)[:, None], w_idx].set(True, mode="drop")
    gt_for_anchor = jnp.zeros((B, A), jnp.int32).at[
        jnp.arange(B)[:, None], w_idx].set(
        jnp.broadcast_to(jnp.arange(M)[None, :, None],
                         (B, M, K)).reshape(B, M * K), mode="drop")

    # one-hot contraction instead of a (B, A) gather from the M-row GT
    # table: the gather lowers to a serial op on TPU (measured 44 ms at
    # B=32/A=25k); the MXU selection matmul does it in 2 ms and is exact in
    # f32 (each output row is one product with 1.0 plus zeros)
    oh = jax.nn.one_hot(gt_for_anchor, M, dtype=jnp.float32)  # (B, A, M)
    tgt_boxes = jnp.einsum("bam,bmc->bac", oh, gt_bboxes.astype(jnp.float32))
    tgt_labels = jnp.einsum(
        "bam,bm->ba", oh, gt_labels.astype(jnp.float32)).astype(jnp.int32)

    # ---------------- losses ----------------------------------------------
    # Box and cls are *per-layer means summed over layers*, exactly like the
    # reference (yolo7_loss.py:97-113: `box_loss += (1-iou).mean()` and
    # `cls_loss += BCEcls(...)` inside the per-layer loop) — NOT a global
    # mean over all matches.
    ciou = bbox_iou(pred_boxes, tgt_boxes, xywh=False, ciou=True)

    obj_target = jnp.where(matched, jax.lax.stop_gradient(
        jnp.clip(ciou, 0.0, 1.0)), 0.0)
    obj_logits = preds[..., 4]
    obj_bce = _bce_logits(obj_logits, obj_target.astype(cdt))

    cls_logits = preds[..., 5:]
    cls_target = (jax.nn.one_hot(tgt_labels, nc, dtype=cdt)
                  * matched[..., None])
    cls_bce = _bce_logits(cls_logits, cls_target).sum(
        -1, dtype=jnp.float32)                                # (B, A)

    loss_box = 0.0
    loss_obj = 0.0
    loss_cls = 0.0
    for l in range(nl):
        sel = lid[None] == l                                  # (1, A)
        m_l = matched & sel
        n_l = m_l.sum()
        denom = jnp.maximum(n_l, 1).astype(jnp.float32)
        loss_box = loss_box + jnp.where(m_l, 1.0 - ciou, 0.0).sum() / denom
        # reference BCEcls reduction='mean' over (n_l, nc) elements
        loss_cls = loss_cls + jnp.where(m_l, cls_bce, 0.0).sum() / (denom * nc)
        # obj: mean over every anchor of the layer, weighted by balance
        layer_obj = jnp.where(sel, obj_bce, 0.0).sum(
            dtype=jnp.float32) / jnp.maximum(sel.sum() * B, 1)
        loss_obj = loss_obj + layer_balance[l] * layer_obj

    # the reference returns the gain-weighted sum WITHOUT a batch-size
    # multiply (yolo7_loss.py:121-127), unlike YOLOv8's loss
    total = (box_gain * loss_box + obj_gain * loss_obj
             + cls_gain * loss_cls)
    return total, {"box_loss": loss_box, "obj_loss": loss_obj,
                   "cls_loss": loss_cls,
                   "num_match": matched.sum().astype(jnp.float32)}



