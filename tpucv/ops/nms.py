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

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpucv.ops.boxes import xywh2xyxy

NEG_INF = -1e10


def nms(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float = 0.45,
    max_det: int = 300,
    diou: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy NMS over N xyxy boxes.

    With ``diou=True`` the suppression criterion is distance-IoU (reference
    ``core/utils/nms.py:9-31`` python-loop diou_nms, used by CenterNet).

    Args:
      boxes: (N, 4) xyxy.
      scores: (N,); invalid candidates should carry score <= 0.
    Returns:
      (indices (max_det,) int32, valid (max_det,) bool)
    """
    n = boxes.shape[0]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2

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
        if diou:
            cw = jnp.maximum(x2[best], x2) - jnp.minimum(x1[best], x1)
            ch = jnp.maximum(y2[best], y2) - jnp.minimum(y1[best], y1)
            rho2 = (cx[best] - cx) ** 2 + (cy[best] - cy) ** 2
            iou = iou - rho2 / (cw**2 + ch**2 + 1e-7)
        suppress = iou > iou_threshold
        live_scores = jnp.where(suppress, NEG_INF, live_scores)
        live_scores = live_scores.at[best].set(NEG_INF)
        return (live_scores,), (best.astype(jnp.int32), valid)

    init = (jnp.where(scores > 0, scores, NEG_INF),)
    _, (idx, valid) = jax.lax.scan(body, init, None, length=max_det)
    return idx, valid


def nms_fixpoint(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float = 0.45,
    max_det: int = 300,
    max_iters: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact greedy NMS via suppression-wave fixpoint — the TPU-shaped
    formulation.

    The scan formulation (``nms``) runs ``max_det`` tiny sequential steps,
    each latency-bound on TPU. Here candidates are score-sorted once, the
    (N, N) IoU matrix is computed once, and suppression propagates in wide
    O(N^2) VPU iterations until fixpoint: box i is suppressed iff some
    higher-ranked *surviving* box overlaps it. At fixpoint this equals the
    greedy keep-set exactly; realistic box sets converge in <10 iterations.

    Returns (indices into the input (max_det,), valid (max_det,)).
    """
    n = boxes.shape[0]
    if max_iters is None:
        # a suppression chain can be at most n-1 deep, so n sweeps always
        # reach the true fixpoint; the `changed` flag exits far earlier on
        # realistic sets (<10 sweeps)
        max_iters = n
    order = jnp.argsort(-scores, stable=True)
    b = boxes[order]
    s = scores[order]
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    area = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    ix = jnp.clip(jnp.minimum(x2[:, None], x2[None]) -
                  jnp.maximum(x1[:, None], x1[None]), 0)
    iy = jnp.clip(jnp.minimum(y2[:, None], y2[None]) -
                  jnp.maximum(y1[:, None], y1[None]), 0)
    inter = ix * iy
    iou = inter / (area[:, None] + area[None] - inter + 1e-7)
    # overlap[i, j]: higher-ranked j (j < i) overlaps i above threshold
    overlap = (iou > iou_threshold) & jnp.tril(jnp.ones((n, n), bool), k=-1)
    invalid = s <= 0

    def cond(state):
        it, changed, _ = state
        return changed & (it < max_iters)

    def body(state):
        it, _, suppressed = state
        active = ~suppressed & ~invalid
        new_sup = jnp.any(overlap & active[None, :], axis=1) | invalid
        changed = jnp.any(new_sup != suppressed)
        return it + 1, changed, new_sup

    _, _, suppressed = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.bool_(True), invalid))
    keep = ~suppressed & ~invalid
    keep_scores = jnp.where(keep, s, NEG_INF)
    top_scores, top_pos = jax.lax.top_k(keep_scores, max_det)
    valid = top_scores > NEG_INF / 2
    idx = order[top_pos]
    return idx.astype(jnp.int32), valid


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
    return nms_fixpoint(off_boxes, scores, iou_threshold, max_det)


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


def dispatch_batched_nms(off_boxes: jax.Array, top_scores: jax.Array,
                         iou_threshold: float, max_det: int,
                         use_pallas: bool | None = None):
    """Pick the exact-NMS engine for presorted (B, K) candidates — the ONE
    home of the kernel-dispatch policy (decode_boxes and
    batched_single_label_nms had drifted copies, code review r3):

    * K <= 1024 on TPU: Pallas VMEM fixpoint kernel (the (K, K) f32 overlap
      matrix fits the 16 MB VMEM budget),
    * K <= 1024 elsewhere: XLA HBM fixpoint,
    * K > 1024 (eval-path candidate floods, conf=0.001): the O(K^2) matrix
      would be ~67 MB/image at K=4096, so the O(max_det*K) sequential-scan
      greedy NMS (exact, memory-light).

    Returns (idx (B, max_det) into the K axis, valid (B, max_det))."""
    K = top_scores.shape[-1]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if K > 1024:
        use_pallas = False
    if use_pallas:
        from tpucv.ops.pallas_nms import pallas_nms
        return pallas_nms(off_boxes, top_scores, iou_threshold, max_det,
                          presorted=True)
    if K <= 1024:
        return jax.vmap(
            lambda b, s: nms_fixpoint(b, s, iou_threshold, max_det)
        )(off_boxes, top_scores)
    return jax.vmap(
        lambda b, s: nms(b, s, iou_threshold, max_det)
    )(off_boxes, top_scores)


def batched_single_label_nms(
    pred: jax.Array,              # (B, A, 4+nc) boxes px + class scores
    conf_threshold: float = 0.25,
    iou_threshold: float = 0.7,
    max_det: int = 300,
    pre_nms_topk: int = 1024,
    class_agnostic: bool = False,
    use_pallas: bool | None = None,
    xywh: bool = True,            # False: pred boxes are already xyxy
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Batched best-class NMS with a Pallas VMEM kernel on TPU and the XLA
    fixpoint elsewhere. Same semantics as ``non_max_suppression`` vmapped."""
    B, A, _ = pred.shape
    cls_scores = pred[:, :, 4:]
    best_cls = jnp.argmax(cls_scores, axis=-1)
    best_score = jnp.max(cls_scores, axis=-1)
    gated = jnp.where(best_score > conf_threshold, best_score, 0.0)
    k = min(pre_nms_topk, A)
    top_scores, top_idx = jax.lax.top_k(gated, k)          # (B, K)
    bi = jnp.arange(B)[:, None]
    top_boxes = pred[:, :, :4][bi, top_idx]
    if xywh:
        top_boxes = xywh2xyxy(top_boxes)
    top_cls = best_cls[bi, top_idx].astype(jnp.int32)
    if class_agnostic:
        off_boxes = top_boxes
    else:
        off_boxes = top_boxes + top_cls[..., None].astype(
            top_boxes.dtype) * 7680.0

    idx, valid = dispatch_batched_nms(off_boxes, top_scores, iou_threshold,
                                      max_det, use_pallas=use_pallas)

    out_boxes = jnp.take_along_axis(top_boxes, idx[..., None], axis=1)
    out_scores = jnp.where(valid, jnp.take_along_axis(top_scores, idx, 1), 0.0)
    out_cls = jnp.take_along_axis(top_cls, idx, axis=1)
    valid = valid & (out_scores > conf_threshold)
    out_boxes = jnp.where(valid[..., None], out_boxes, 0.0)
    return out_boxes, out_scores, out_cls, valid


def non_max_suppression_multilabel(
    boxes: jax.Array,
    cls_scores: jax.Array,
    conf_threshold: float = 0.01,
    iou_threshold: float = 0.45,
    max_det: int = 100,
    pre_nms_topk: int = 1024,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-class NMS in the reference's SSD/YOLOv7 style
    (``core/algorithms/ssd.py:236-288``, ``yolo_v7.py:348-422``): every
    (anchor, class) pair above threshold is an independent candidate.

    Implemented statically: flatten (A, nc) scores, top-k pre-NMS candidates,
    then class-offset NMS — identical keep-set to looping classes.

    Args:
      boxes: (A, 4) xyxy; cls_scores: (A, nc) probabilities.
    """
    A, nc = cls_scores.shape
    flat = jnp.where(cls_scores > conf_threshold, cls_scores, 0.0).reshape(-1)
    k = min(pre_nms_topk, A * nc)
    top_scores, top_idx = jax.lax.top_k(flat, k)
    anchor_idx = top_idx // nc
    cls_idx = (top_idx % nc).astype(jnp.int32)
    cand_boxes = boxes[anchor_idx]
    idx, valid = batched_nms(cand_boxes, top_scores, cls_idx,
                             iou_threshold, max_det)
    out_boxes = cand_boxes[idx]
    out_scores = jnp.where(valid, top_scores[idx], 0.0)
    out_cls = cls_idx[idx]
    valid = valid & (out_scores > conf_threshold)
    out_boxes = jnp.where(valid[:, None], out_boxes, 0.0)
    return out_boxes, out_scores, out_cls, valid


batched_non_max_suppression_multilabel = jax.vmap(
    non_max_suppression_multilabel, in_axes=(0, 0, None, None, None, None),
    out_axes=0,
)
