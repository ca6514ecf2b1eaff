"""YOLOv3 (legacy path, unregistered — mirrors the reference's status:
``core/models/yolov3_model.py``, trainer not in check.MODELS).

Darknet-53 backbone with stride-2 asymmetric-pad convs (:5-25),
ResidualBlocks (:28-40), FPN-style YoloBlocks -> 3 scales (:70-133)."""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpucv.nn.blocks import upsample2x as _up2

Dtype = Any


class DarkConv(nn.Module):
    feat: int
    k: int = 3
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.s == 2:
            # reference uses ZeroPad2d((1,0,1,0)) + valid conv (:5-25)
            pad = ((1, 0), (1, 0))
        else:
            p = self.k // 2
            pad = ((p, p), (p, p))
        x = nn.Conv(self.feat, (self.k, self.k), (self.s, self.s),
                    padding=pad, use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn")(x)
        return nn.leaky_relu(x, 0.1)


class Residual(nn.Module):
    feat: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = DarkConv(self.feat // 2, 1, dtype=self.dtype, name="cv1")(x, train)
        y = DarkConv(self.feat, 3, dtype=self.dtype, name="cv2")(y, train)
        return x + y


class YoloV3(nn.Module):
    """Returns raw maps [(B,S/32,S/32,na*(5+nc)), S/16, S/8]
    (reference order: 13/26/52 for 416)."""

    nc: int = 80
    na: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jax.Array, ...]:
        dt = self.dtype
        x = DarkConv(32, 3, dtype=dt, name="c0")(x, train)
        cfgs = [(64, 1), (128, 2), (256, 8), (512, 8), (1024, 4)]
        feats = {}
        for si, (ch, nres) in enumerate(cfgs):
            x = DarkConv(ch, 3, 2, dtype=dt, name=f"down{si}")(x, train)
            for ri in range(nres):
                x = Residual(ch, dtype=dt, name=f"res{si}_{ri}")(x, train)
            feats[ch] = x

        no = self.na * (5 + self.nc)

        def yolo_block(x, ch, name):
            for i in range(2):
                x = DarkConv(ch, 1, dtype=dt, name=f"{name}_a{i}")(x, train)
                x = DarkConv(ch * 2, 3, dtype=dt, name=f"{name}_b{i}")(x, train)
            branch = DarkConv(ch, 1, dtype=dt, name=f"{name}_c")(x, train)
            head = DarkConv(ch * 2, 3, dtype=dt, name=f"{name}_d")(branch, train)
            head = nn.Conv(no, (1, 1), use_bias=True, dtype=dt,
                           param_dtype=jnp.float32, name=f"{name}_out")(head)
            return branch, head

        b5, o5 = yolo_block(feats[1024], 512, "y5")
        up = DarkConv(256, 1, dtype=dt, name="up5")(b5, train)
        up = _up2(up)
        b4, o4 = yolo_block(jnp.concatenate([up, feats[512]], -1), 256, "y4")
        up = DarkConv(128, 1, dtype=dt, name="up4")(b4, train)
        up = _up2(up)
        _, o3 = yolo_block(jnp.concatenate([up, feats[256]], -1), 128, "y3")
        return o5, o4, o3



