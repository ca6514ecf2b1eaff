"""Fixed-shape, jittable non-maximum suppression for TPU.

The reference leans on CUDA ``torchvision.ops.batched_nms``
(``core/utils/ultralytics_ops.py:247``, ``core/algorithms/yolo_v7.py:407``,
``core/algorithms/ssd.py:267``). TPU/XLA needs static shapes and no
data-dependent gather sizes, so this implementation:

  * takes a fixed candidate count N (pre-NMS top-k), returns a fixed
    ``max_det`` slate with a validity mask,
  * is greedy-exact: identical keep-set to torchvision for distinct scores
    (iterative argmax + IoU suppression, O(max_det * N) vector work),
  * handles class-awareness by the standard coordinate-offset trick
    (same semantics as ``batched_nms``).

Everything vmaps over the batch dimension and runs entirely on-device.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tpucv.ops.boxes import xywh2xyxy

NEG_INF = -1e10


def nms(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float = 0.45,
    max_det: int = 300,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy NMS over N xyxy boxes.

    Args:
      boxes: (N, 4) xyxy.
      scores: (N,); invalid candidates should carry score <= 0.
    Returns:
      (indices (max_det,) int32, valid (max_det,) bool)
    """
    n = boxes.shape[0]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)

    def body(state, _):
        live_scores, = state
        best = jnp.argmax(live_scores)
        best_score = live_scores[best]
        valid = best_score > NEG_INF / 2
        # IoU of best vs all
        xx1 = jnp.maximum(x1[best], x1)
        yy1 = jnp.maximum(y1[best], y1)
        xx2 = jnp.minimum(x2[best], x2)
        yy2 = jnp.minimum(y2[best], y2)
        inter = jnp.clip(xx2 - xx1, 0) * jnp.clip(yy2 - yy1, 0)
        iou = inter / (areas[best] + areas - inter + 1e-7)
        suppress = iou > iou_threshold
        live_scores = jnp.where(suppress, NEG_INF, live_scores)
        live_scores = live_scores.at[best].set(NEG_INF)
        return (live_scores,), (best.astype(jnp.int32), valid)

    init = (jnp.where(scores > 0, scores, NEG_INF),)
    _, (idx, valid) = jax.lax.scan(body, init, None, length=max_det)
    return idx, valid


def batched_nms(
    boxes: jax.Array,
    scores: jax.Array,
    class_ids: jax.Array,
    iou_threshold: float = 0.45,
    max_det: int = 300,
    class_agnostic: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Class-aware NMS via the coordinate-offset trick (torchvision
    ``batched_nms`` semantics). ``boxes`` xyxy, coords assumed < ~7680."""
    if class_agnostic:
        off_boxes = boxes
    else:
        offset = class_ids.astype(boxes.dtype)[:, None] * 7680.0
        off_boxes = boxes + offset
    return nms(off_boxes, scores, iou_threshold, max_det)


def non_max_suppression(
    pred: jax.Array,
    conf_threshold: float = 0.25,
    iou_threshold: float = 0.45,
    max_det: int = 300,
    pre_nms_topk: int = 2048,
    class_agnostic: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """YOLO-style decode-and-suppress for one image, fixed shapes throughout.

    Mirrors the behaviour of reference ``non_max_suppression``
    (``core/utils/ultralytics_ops.py:131-264``): confidence gate on the best
    class, xywh→xyxy, class-aware NMS, cap at ``max_det``.

    Args:
      pred: (A, 4+nc) — xywh (pixels) + per-class scores in [0,1].
    Returns:
      boxes (max_det, 4) xyxy, scores (max_det,), classes (max_det,) int32,
      valid (max_det,) bool.
    """
    boxes_xywh = pred[:, :4]
    cls_scores = pred[:, 4:]
    best_cls = jnp.argmax(cls_scores, axis=-1)
    best_score = jnp.max(cls_scores, axis=-1)
    keep = best_score > conf_threshold
    gated = jnp.where(keep, best_score, 0.0)

    k = min(pre_nms_topk, gated.shape[0])
    top_scores, top_idx = jax.lax.top_k(gated, k)
    top_boxes = xywh2xyxy(boxes_xywh[top_idx])
    top_cls = best_cls[top_idx]

    idx, valid = batched_nms(
        top_boxes, top_scores, top_cls, iou_threshold, max_det,
        class_agnostic=class_agnostic,
    )
    out_boxes = top_boxes[idx]
    out_scores = jnp.where(valid, top_scores[idx], 0.0)
    out_cls = top_cls[idx].astype(jnp.int32)
    valid = valid & (out_scores > conf_threshold)
    out_boxes = jnp.where(valid[:, None], out_boxes, 0.0)
    return out_boxes, out_scores, out_cls, valid


batched_non_max_suppression = jax.vmap(
    non_max_suppression, in_axes=(0, None, None, None, None, None),
    out_axes=0,
)
