"""YOLOv8-seg decode: detection decode + per-detection mask coefficients.

Masks themselves are combined lazily (``tpucv.ops.masks.process_mask`` on
the returned coefficients + prototypes) so callers pick the output
resolution; everything here is jittable with static shapes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from tpucv.decode.yolov8 import decode_boxes


def decode_seg(
    raw: Tuple,
    nc: int = 80,
    reg_max: int = 16,
    strides: Sequence[int] = (8, 16, 32),
    conf_threshold: float = 0.25,
    iou_threshold: float = 0.7,
    max_det: int = 300,
    pre_nms_topk: int = 2048,
):
    """Returns (boxes xyxy px, scores, classes, valid, coefs (B,max_det,nm),
    protos (B,Hm,Wm,nm))."""
    det_maps, coef_maps, protos = raw
    B = det_maps[0].shape[0]
    nm = protos.shape[-1]
    boxes, scores, classes, valid, anchor_idx = decode_boxes(
        det_maps, nc=nc, reg_max=reg_max, strides=strides,
        conf_threshold=conf_threshold, iou_threshold=iou_threshold,
        max_det=max_det, pre_nms_topk=pre_nms_topk, return_idx=True)
    coefs = jnp.concatenate(
        [m.reshape(B, -1, nm) for m in coef_maps], axis=1).astype(jnp.float32)
    sel = jnp.take_along_axis(coefs, anchor_idx[..., None], axis=1)
    return boxes, scores, classes, valid, sel, protos
