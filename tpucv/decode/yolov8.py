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
from tpucv.ops.nms import batched_non_max_suppression


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
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Full decode + NMS. Returns per image fixed-shape
    (boxes (B,max_det,4) xyxy pixels, scores, classes, valid)."""
    pred = raw_to_pred(raw_maps, nc, reg_max, strides)
    return batched_non_max_suppression(
        pred, conf_threshold, iou_threshold, max_det, pre_nms_topk, False
    )
