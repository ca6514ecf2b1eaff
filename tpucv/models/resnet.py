"""ResNet-50/101 backbone with dilation support (reference
``core/models/resnet.py``: torchvision-style Bottleneck, returns
{"low_level": layer1, "out": layer4}, ``replace_stride_with_dilation`` for
DeepLab output_stride 8/16)."""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class BNConv(nn.Module):
    feat: int
    k: int = 3
    s: int = 1
    dilation: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # int8 PTQ hooks ride in quant.conv_bn (inert unless calibrating
        # or a 'quant' collection is supplied with the variables)
        from tpucv import quant

        x = quant.conv_bn(
            self, x, features=self.feat, kernel=self.k, strides=self.s,
            padding=self.dilation * (self.k - 1) // 2,
            dilation=self.dilation, dtype=self.dtype, train=train)
        return nn.relu(x) if self.act else x


class Bottleneck(nn.Module):
    planes: int
    s: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = BNConv(self.planes, 1, dtype=self.dtype, name="cv1")(x, train)
        y = BNConv(self.planes, 3, self.s, self.dilation, dtype=self.dtype,
                   name="cv2")(y, train)
        y = BNConv(self.planes * 4, 1, act=False, dtype=self.dtype,
                   name="cv3")(y, train)
        if self.downsample:
            identity = BNConv(self.planes * 4, 1, self.s, act=False,
                              dtype=self.dtype, name="down")(x, train)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """layers: block counts, e.g. (3, 4, 23, 3) for resnet101."""

    layers: Tuple[int, ...] = (3, 4, 23, 3)
    output_stride: int = 16           # 8 | 16 | 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jax.Array]:
        # torchvision replace_stride_with_dilation bookkeeping (reference
        # resnet.py:197-236): the FIRST block of a dilated layer keeps the
        # previous dilation; later blocks use the increased one.
        if self.output_stride == 32:
            dilate_flags = (False, False, False, False)
        elif self.output_stride == 16:
            dilate_flags = (False, False, False, True)
        else:  # 8
            dilate_flags = (False, False, True, True)

        x = BNConv(64, 7, 2, dtype=self.dtype, name="stem")(x, train)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))

        outs = {}
        planes = (64, 128, 256, 512)
        nominal_strides = (1, 2, 2, 2)
        dilation = 1
        for li, (n, p, s, dilate) in enumerate(
                zip(self.layers, planes, nominal_strides, dilate_flags)):
            prev_dilation = dilation
            if dilate:
                dilation *= s
                s = 1
            for b in range(n):
                x = Bottleneck(
                    p, s=s if b == 0 else 1,
                    dilation=prev_dilation if b == 0 else dilation,
                    downsample=(b == 0), dtype=self.dtype,
                    name=f"layer{li + 1}_{b}")(x, train)
            if li == 0:
                outs["low_level"] = x
        outs["out"] = x
        return outs


def resnet50(output_stride=16, dtype=jnp.float32) -> ResNet:
    return ResNet((3, 4, 6, 3), output_stride, dtype)


def resnet101(output_stride=16, dtype=jnp.float32) -> ResNet:
    return ResNet((3, 4, 23, 3), output_stride, dtype)
