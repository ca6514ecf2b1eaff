"""SSD decode: raw (loc, conf) -> boxes (reference ``Ssd.decode_boxes``,
core/algorithms/ssd.py:236-325): softmax scores minus background, variance
decode against priors, per-class NMS — all fixed-shape and jitted."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tpucv.ops.nms import batched_non_max_suppression_multilabel
from tpucv.targets.ssd import decode_boxes as decode_loc


def decode_ssd(
    loc: jax.Array,           # (B, A, 4)
    conf: jax.Array,          # (B, A, nc) logits incl background class 0
    priors: jax.Array,        # (A, 4) xyxy normalised
    input_size: int,
    conf_threshold: float = 0.5,
    iou_threshold: float = 0.45,
    max_det: int = 100,
    pre_nms_topk: int = 1024,
    variances=(0.1, 0.2),
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    scores = jax.nn.softmax(conf.astype(jnp.float32), axis=-1)[..., 1:]
    boxes = decode_loc(loc.astype(jnp.float32), priors[None], variances)
    boxes = jnp.clip(boxes, 0.0, 1.0) * input_size
    return batched_non_max_suppression_multilabel(
        boxes, scores, conf_threshold, iou_threshold, max_det, pre_nms_topk)
