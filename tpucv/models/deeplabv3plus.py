"""DeepLabV3+ with ResNet backbone (reference
``core/models/deeplabv3plus.py``): ASPP (1x1 + three atrous branches + image
pooling, :42-75), decoder with low-level projection (:78-119), bilinear
upsample to input size (:122-149)."""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpucv.models.resnet import BNConv, resnet101, resnet50

Dtype = Any


class ASPP(nn.Module):
    out_ch: int = 256
    rates: Tuple[int, ...] = (6, 12, 18)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, _ = x.shape
        ys = [BNConv(self.out_ch, 1, dtype=self.dtype, name="b0")(x, train)]
        for i, r in enumerate(self.rates):
            ys.append(BNConv(self.out_ch, 3, dilation=r, dtype=self.dtype,
                             name=f"b{i + 1}")(x, train))
        # image pooling branch
        gp = jnp.mean(x, axis=(1, 2), keepdims=True)
        gp = BNConv(self.out_ch, 1, dtype=self.dtype, name="pool")(gp, train)
        gp = jnp.broadcast_to(gp, (b, h, w, self.out_ch))
        ys.append(gp)
        y = jnp.concatenate(ys, axis=-1)
        y = BNConv(self.out_ch, 1, dtype=self.dtype, name="proj")(y, train)
        # reference ASPP.project ends with Dropout(0.1) (deeplabv3plus.py:68)
        return nn.Dropout(0.1, deterministic=not train, name="drop")(y)


class DeeplabV3Plus(nn.Module):
    num_classes: int = 21
    backbone: str = "resnet101"
    output_stride: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        H, W = x.shape[1:3]
        from tpucv.models.resnet import ResNet
        layers = (3, 4, 23, 3) if self.backbone == "resnet101" else (3, 4, 6, 3)
        bb = ResNet(layers, self.output_stride, self.dtype, name="backbone")
        feats = bb(x, train)
        rates = (12, 24, 36) if self.output_stride == 8 else (6, 12, 18)
        y = ASPP(rates=rates, dtype=self.dtype, name="aspp")(
            feats["out"], train)
        # decoder (reference DeeplabHeadV3Plus :95-121): concat order is
        # [projected low-level (48), upsampled ASPP (256)], then ONE 3x3
        # conv+BN+ReLU and the 1x1 classifier
        low = BNConv(48, 1, dtype=self.dtype, name="low_proj")(
            feats["low_level"], train)
        b, lh, lw, _ = low.shape
        y = jax.image.resize(y, (b, lh, lw, y.shape[-1]), "bilinear")
        y = jnp.concatenate([low, y], axis=-1)
        y = BNConv(256, 3, dtype=self.dtype, name="dec1")(y, train)
        y = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="classifier")(y)
        return jax.image.resize(
            y.astype(jnp.float32), (b, H, W, self.num_classes), "bilinear")
