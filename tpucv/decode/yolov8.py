"""YOLOv8 decode: raw head maps -> boxes, fully jittable, static shapes.

This is the functional re-design of the eval branch of the reference's
``Detect.forward`` (modules.py:428-446) + ``YOLOv8.decode_box``
(core/algorithms/yolo_v8.py:210-242): anchor generation, DFL expectation
decode, dist2bbox, sigmoid-class scores, then fixed-shape class-aware NMS.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from tpucv.nn.heads import dfl_project
from tpucv.ops.anchors import make_anchors
from tpucv.ops.boxes import dist2bbox
from tpucv.ops.nms import batched_single_label_nms


def raw_to_pred(
    raw_maps: Sequence[jax.Array],
    nc: int = 80,
    reg_max: int = 16,
    strides: Sequence[int] = (8, 16, 32),
) -> jax.Array:
    """Per-level raw maps -> (B, A, 4+nc): xywh boxes in input pixels +
    sigmoid class scores. A = sum(H*W) (8400 for 640 input)."""
    feat_shapes = [m.shape[1:3] for m in raw_maps]
    anchor_points, stride_arr = make_anchors(feat_shapes, strides)

    flat = [m.reshape(m.shape[0], -1, m.shape[-1]) for m in raw_maps]
    x = jnp.concatenate(flat, axis=1).astype(jnp.float32)  # (B, A, no)
    box_dist, cls = x[..., : 4 * reg_max], x[..., 4 * reg_max:]
    dist = dfl_project(box_dist, reg_max)                    # (B, A, 4)
    boxes = dist2bbox(dist, anchor_points[None], xywh=True) * stride_arr[None]
    scores = jax.nn.sigmoid(cls)
    return jnp.concatenate([boxes, scores], axis=-1)


def decode_boxes(
    raw_maps: Sequence[jax.Array],
    nc: int = 80,
    reg_max: int = 16,
    strides: Sequence[int] = (8, 16, 32),
    conf_threshold: float = 0.25,
    iou_threshold: float = 0.7,
    max_det: int = 300,
    pre_nms_topk: int = 2048,
    return_idx: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Full decode + NMS, top-k-first: rank all anchors by best-class score
    (cheap, bf16), then run the DFL expectation decode only on the K
    surviving candidates — 8x less decode bandwidth than decoding all 8400
    anchors. Returns fixed-shape (boxes (B,max_det,4) xyxy px, scores,
    classes, valid)."""
    from tpucv.ops.boxes import xywh2xyxy

    feat_shapes = [m.shape[1:3] for m in raw_maps]
    anchor_points, stride_arr = make_anchors(feat_shapes, strides)

    B = raw_maps[0].shape[0]
    # Per-level processing straight off the head's NHWC maps — no (B, A, no)
    # concat materialisation (only the small per-anchor results concat):
    #   * best class via max over LOGITS then one sigmoid — identical by
    #     monotonicity, skips the (B, A, nc) sigmoid materialisation
    #   * DFL expectation over ALL anchors in bf16 (cheaper on TPU than a
    #     big gather of the 64-bin logits for the top-k — measured 3ms/batch
    #     slower at B=128), then a small (B, K, 4) gather of decoded boxes
    proj = jnp.arange(reg_max, dtype=raw_maps[0].dtype)
    bests, bcls, dists = [], [], []
    for m in raw_maps:
        logits = m[..., 4 * reg_max:]                     # (B, H, W, nc)
        bests.append(jax.nn.sigmoid(jnp.max(logits, -1)).reshape(B, -1))
        bcls.append(jnp.argmax(logits, -1).reshape(B, -1))
        bd = m[..., : 4 * reg_max].reshape(B, -1, 4, reg_max)
        sm = jax.nn.softmax(bd, axis=-1)
        dists.append(jnp.einsum("bakr,r->bak", sm, proj))
    best_score = jnp.concatenate(bests, 1).astype(jnp.float32)  # (B, A)
    best_cls = jnp.concatenate(bcls, 1).astype(jnp.int32)
    dist = jnp.concatenate(dists, 1).astype(jnp.float32)        # (B, A, 4)
    A = best_score.shape[1]
    all_boxes = dist2bbox(dist, anchor_points[None]) * stride_arr[None]

    gated = jnp.where(best_score > conf_threshold, best_score, 0.0)
    k = min(pre_nms_topk, A)
    top_scores, top_idx = jax.lax.top_k(gated, k)           # (B, K)
    bi = jnp.arange(B)[:, None]
    boxes = all_boxes[bi, top_idx]                          # (B, K, 4)
    top_cls = best_cls[bi, top_idx]

    off = boxes + top_cls[..., None].astype(boxes.dtype) * 7680.0
    # kernel-dispatch policy (Pallas VMEM / XLA fixpoint / scan greedy)
    # lives in ONE place; top_k already returned scores descending
    from tpucv.ops.nms import dispatch_batched_nms
    idx, valid = dispatch_batched_nms(off, top_scores, iou_threshold, max_det)
    out_boxes = jnp.take_along_axis(boxes, idx[..., None], 1)
    out_scores = jnp.where(valid, jnp.take_along_axis(top_scores, idx, 1), 0.0)
    out_cls = jnp.take_along_axis(top_cls, idx, 1)
    valid = valid & (out_scores > conf_threshold)
    out_boxes = jnp.where(valid[..., None], out_boxes, 0.0)
    if return_idx:
        # flat anchor index of each kept detection (segmentation heads
        # gather their per-anchor mask coefficients with it)
        anchor_idx = jnp.take_along_axis(top_idx, idx, 1)
        return out_boxes, out_scores, out_cls, valid, anchor_idx
    return out_boxes, out_scores, out_cls, valid
