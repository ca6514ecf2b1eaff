"""YOLOv8 detection network (n/s/m/l/x), TPU-native.

Re-design of the reference's hardcoded 23-layer graph
(``/root/reference/core/models/yolov8/yolo_v8.py:64-132``): same CSPDarknet +
C2f + SPPF backbone and PAN-FPN head, but expressed as a declarative flax
module in NHWC with bf16 compute, and *without* the train/eval-branching
Detect — the network returns raw per-level maps; decode is separate
(``tpucv.decode.yolov8``).

Width/depth/channel-cap scaling matches the reference factories
(``yolo_v8.py:110-132``) so parameter counts line up exactly
(n: 3,157,200 params at nc=80 per ``yolo_v8.py:111``).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpucv.nn.blocks import C2f, ConvBnAct, SPPF, upsample2x
from tpucv.nn.heads import DetectHead

Dtype = Any

# (depth_multiple, width_multiple, max_channels) per model scale —
# reference yolo_v8.py:110-132 / ultralytics yolov8.yaml "scales".
SCALES: Dict[str, Tuple[float, float, int]] = {
    "n": (1 / 3, 0.25, 1024),
    "s": (1 / 3, 0.50, 1024),
    "m": (2 / 3, 0.75, 768),
    "l": (1.0, 1.00, 512),
    "x": (1.0, 1.25, 512),
}


def _c(ch: int, width: float, max_ch: int) -> int:
    """Scaled channel count, rounded to a multiple of 8 (ultralytics rule)."""
    return int(math.ceil(min(ch, max_ch) * width / 8) * 8)


def _n(n: int, depth: float) -> int:
    return max(round(n * depth), 1)


class Yolo8(nn.Module):
    """YOLOv8 backbone + PAN-FPN + decoupled head.

    Returns raw maps ``((B,80,80,no), (B,40,40,no), (B,20,20,no))`` for a
    640 input, where ``no = 4*reg_max + nc``.
    """

    scale: str = "n"
    nc: int = 80
    reg_max: int = 16
    head: str = "detect"            # "detect" | "segment" | "pose" | "classify"
    n_masks: int = 32               # segment head prototypes
    kpt_shape: Tuple[int, int] = (17, 3)   # pose head keypoints
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, ...]:
        d, w, mc = SCALES[self.scale]
        c = lambda ch: _c(ch, w, mc)
        n = lambda k: _n(k, d)
        dt = self.dtype

        # Backbone (P1..P5) — layers 0-9 of the reference graph.
        x = ConvBnAct(c(64), 3, 2, dtype=dt, name="b0")(x, train)          # P1/2
        x = ConvBnAct(c(128), 3, 2, dtype=dt, name="b1")(x, train)         # P2/4
        x = C2f(c(128), n(3), True, dtype=dt, name="b2")(x, train)
        x = ConvBnAct(c(256), 3, 2, dtype=dt, name="b3")(x, train)         # P3/8
        p3 = C2f(c(256), n(6), True, dtype=dt, name="b4")(x, train)        # save 4
        x = ConvBnAct(c(512), 3, 2, dtype=dt, name="b5")(p3, train)        # P4/16
        p4 = C2f(c(512), n(6), True, dtype=dt, name="b6")(x, train)        # save 6
        x = ConvBnAct(c(1024), 3, 2, dtype=dt, name="b7")(p4, train)       # P5/32
        x = C2f(c(1024), n(3), True, dtype=dt, name="b8")(x, train)

        if self.head == "classify":
            # yolov8-cls graph (reference ships the spec as
            # core/models/yolov8/yolov8-cls.yaml): backbone layers 0-8
            # (no SPPF, no FPN) -> Classify head, 224^2 input.
            from tpucv.nn.heads import ClassifyHead
            return ClassifyHead(nc=self.nc, dtype=dt,
                                name="classify")(x, train)

        p5 = SPPF(c(1024), 5, dtype=dt, name="b9")(x, train)               # save 9

        # PAN-FPN head — layers 10-21.
        x = jnp.concatenate([upsample2x(p5), p4], axis=-1)                 # 10,11
        h12 = C2f(c(512), n(3), False, dtype=dt, name="h12")(x, train)     # save 12
        x = jnp.concatenate([upsample2x(h12), p3], axis=-1)                # 13,14
        h15 = C2f(c(256), n(3), False, dtype=dt, name="h15")(x, train)     # save 15 (P3 out)
        x = ConvBnAct(c(256), 3, 2, dtype=dt, name="h16")(h15, train)
        x = jnp.concatenate([x, h12], axis=-1)                             # 17
        h18 = C2f(c(512), n(3), False, dtype=dt, name="h18")(x, train)     # save 18 (P4 out)
        x = ConvBnAct(c(512), 3, 2, dtype=dt, name="h19")(h18, train)
        x = jnp.concatenate([x, p5], axis=-1)                              # 20
        h21 = C2f(c(1024), n(3), False, dtype=dt, name="h21")(x, train)    # save 21 (P5 out)

        feats = (h15, h18, h21)
        if self.head == "segment":
            from tpucv.nn.heads import SegmentHead
            return SegmentHead(
                nc=self.nc, n_masks=self.n_masks, reg_max=self.reg_max,
                strides=(8, 16, 32), dtype=dt, name="segment",
            )(feats, train)
        if self.head == "pose":
            from tpucv.nn.heads import PoseHead
            return PoseHead(
                nc=self.nc, kpt_shape=self.kpt_shape, reg_max=self.reg_max,
                strides=(8, 16, 32), dtype=dt, name="pose",
            )(feats, train)
        return DetectHead(
            nc=self.nc, reg_max=self.reg_max, strides=(8, 16, 32),
            dtype=dt, name="detect",
        )(feats, train)


def build_yolo8(scale: str, nc: int = 80, dtype: Dtype = jnp.float32) -> Yolo8:
    return Yolo8(scale=scale, nc=nc, dtype=dtype)


def get_yolo8_n(nc: int = 80, dtype: Dtype = jnp.float32) -> Yolo8:
    return build_yolo8("n", nc, dtype)


def get_yolo8_s(nc: int = 80, dtype: Dtype = jnp.float32) -> Yolo8:
    return build_yolo8("s", nc, dtype)


def get_yolo8_m(nc: int = 80, dtype: Dtype = jnp.float32) -> Yolo8:
    return build_yolo8("m", nc, dtype)


def get_yolo8_l(nc: int = 80, dtype: Dtype = jnp.float32) -> Yolo8:
    return build_yolo8("l", nc, dtype)


def get_yolo8_x(nc: int = 80, dtype: Dtype = jnp.float32) -> Yolo8:
    return build_yolo8("x", nc, dtype)
