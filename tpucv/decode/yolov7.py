"""YOLOv7 anchor-grid decode (reference ``core/algorithms/yolo_v7.py:234-346``:
sigmoid*2-0.5 xy, (sigmoid*2)^2 wh parameterisation; per-class NMS :348-422)."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

def raw_to_pred_yolo7(
    raw_maps: Sequence[jax.Array],
    anchors: np.ndarray,           # (nl, na, 2) pixel units
    strides: Sequence[int],
    nc: int,
) -> Tuple[jax.Array, jax.Array]:
    """Raw maps -> (boxes (B, A, 4) xyxy px, scores (B, A, nc))."""
    boxes_all, scores_all = [], []
    na = anchors.shape[1]
    for l, (m, s) in enumerate(zip(raw_maps, strides)):
        B, H, W, _ = m.shape
        x = m.reshape(B, H, W, na, 5 + nc).astype(jnp.float32)
        gy, gx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                              jnp.arange(W, dtype=jnp.float32), indexing="ij")
        grid = jnp.stack([gx, gy], axis=-1)[None, :, :, None, :]
        sig = jax.nn.sigmoid(x)
        xy = (sig[..., :2] * 2.0 - 0.5 + grid) * s
        wh = (sig[..., 2:4] * 2.0) ** 2 * jnp.asarray(
            anchors[l], jnp.float32)[None, None, None, :, :]
        obj = sig[..., 4:5]
        cls = sig[..., 5:]
        score = obj * cls
        b = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
        boxes_all.append(b.reshape(B, -1, 4))
        scores_all.append(score.reshape(B, -1, nc))
    return (jnp.concatenate(boxes_all, axis=1),
            jnp.concatenate(scores_all, axis=1))


def decode_yolov7(
    raw_maps: Sequence[jax.Array],
    anchors: np.ndarray,
    strides: Sequence[int],
    nc: int,
    conf_threshold: float = 0.5,
    iou_threshold: float = 0.3,
    max_det: int = 100,
    pre_nms_topk: int = 1024,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Single-label per-class NMS, matching the reference protocol
    (``yolo_v7.py:368-410``): each anchor contributes only its argmax class
    with score obj * class_conf — NOT one candidate per class above
    threshold (that multilabel variant is ``non_max_suppression_multilabel``,
    which the reference uses for SSD but not YOLOv7)."""
    from tpucv.ops.nms import batched_single_label_nms

    boxes, scores = raw_to_pred_yolo7(raw_maps, anchors, strides, nc)
    pred = jnp.concatenate([boxes, scores], axis=-1)
    return batched_single_label_nms(
        pred, conf_threshold, iou_threshold, max_det, pre_nms_topk,
        xywh=False)
