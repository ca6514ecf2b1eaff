"""YOLOv3 decode (reference ``core/predict/yolov3_decode.py``: sigmoid xy +
exp wh x anchors :12-29, multi-scale concat + per-class NMS :32-66)."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpucv.ops.nms import batched_non_max_suppression_multilabel


def raw_to_pred_yolo3(
    raw_maps: Sequence[jax.Array],
    anchors: np.ndarray,              # (9, 2) px
    anchor_mask: Sequence[Sequence[int]],
    strides: Sequence[int],
    nc: int,
) -> Tuple[jax.Array, jax.Array]:
    boxes_all, scores_all = [], []
    for l, (m, s) in enumerate(zip(raw_maps, strides)):
        ids = list(anchor_mask[l])
        na = len(ids)
        anc = jnp.asarray(anchors, jnp.float32)[jnp.asarray(ids)]
        B, H, W, _ = m.shape
        x = m.reshape(B, H, W, na, 5 + nc).astype(jnp.float32)
        gy, gx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                              jnp.arange(W, dtype=jnp.float32), indexing="ij")
        cx = (jax.nn.sigmoid(x[..., 0]) + gx[None, :, :, None]) * s
        cy = (jax.nn.sigmoid(x[..., 1]) + gy[None, :, :, None]) * s
        w = jnp.exp(jnp.clip(x[..., 2], -10, 10)) * anc[None, None, None, :, 0]
        h = jnp.exp(jnp.clip(x[..., 3], -10, 10)) * anc[None, None, None, :, 1]
        obj = jax.nn.sigmoid(x[..., 4:5])
        cls = jax.nn.sigmoid(x[..., 5:])
        score = obj * cls
        b = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
        boxes_all.append(b.reshape(B, -1, 4))
        scores_all.append(score.reshape(B, -1, nc))
    return (jnp.concatenate(boxes_all, axis=1),
            jnp.concatenate(scores_all, axis=1))


def decode_yolov3(
    raw_maps: Sequence[jax.Array],
    anchors: np.ndarray,
    anchor_mask: Sequence[Sequence[int]],
    strides: Sequence[int],
    nc: int,
    conf_threshold: float = 0.5,
    iou_threshold: float = 0.45,
    max_det: int = 100,
    pre_nms_topk: int = 1024,
):
    boxes, scores = raw_to_pred_yolo3(
        raw_maps, anchors, anchor_mask, strides, nc)
    return batched_non_max_suppression_multilabel(
        boxes, scores, conf_threshold, iou_threshold, max_det, pre_nms_topk)
