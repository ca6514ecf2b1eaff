"""Secondary model zoo entries, capability parity with the reference's
non-registered networks: VGG builder (``core/models/vgg.py``), MobileNetV2
(``core/models/mobilenet_v2.py``, the intended alt SSD backbone), UNet
(``core/models/unet.py``)."""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

VGG_CFGS = {
    11: (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    13: (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
         512, 512, "M"),
    16: (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
         512, 512, 512, "M"),
    19: (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
         512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
}


class VGG(nn.Module):
    """VGG-BN feature extractor with ``end_layer`` slicing
    (reference BaseVGG :34 / get_vgg :82)."""

    depth: int = 16
    end_layer: int = -1          # stop after N entries of the cfg (-1 = all)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = VGG_CFGS[self.depth]
        end = len(cfg) if self.end_layer < 0 else self.end_layer
        ci = 0
        for spec in cfg[:end]:
            if spec == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
            else:
                x = nn.Conv(spec, (3, 3), padding=((1, 1), (1, 1)),
                            use_bias=False, dtype=self.dtype,
                            param_dtype=jnp.float32, name=f"conv{ci}")(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 param_dtype=jnp.float32, name=f"bn{ci}")(x)
                x = nn.relu(x)
                ci += 1
        return x


class InvertedResidual(nn.Module):
    out_ch: int
    s: int = 1
    expand: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hid = in_ch * self.expand
        y = x
        if self.expand != 1:
            y = nn.Conv(hid, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="expand")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             param_dtype=jnp.float32, name="expand_bn")(y)
            y = nn.relu6(y)
        y = nn.Conv(hid, (3, 3), (self.s, self.s), padding=((1, 1), (1, 1)),
                    feature_group_count=hid, use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="dw")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="dw_bn")(y)
        y = nn.relu6(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="proj")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="proj_bn")(y)
        if self.s == 1 and in_ch == self.out_ch:
            y = x + y
        return y


class MobileNetV2(nn.Module):
    num_classes: int = 1000
    width: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def c(ch):
            return max(8, int(ch * self.width + 4) // 8 * 8)

        x = nn.Conv(c(32), (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="stem_bn")(x)
        x = nn.relu6(x)
        # (expand, out, n, stride)
        cfg = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
               (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
        bi = 0
        for e, o, n, s in cfg:
            for i in range(n):
                x = InvertedResidual(c(o), s if i == 0 else 1, e,
                                     dtype=self.dtype, name=f"ir{bi}")(x, train)
                bi += 1
        x = nn.Conv(c(1280), (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="head_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="head_bn")(x)
        x = nn.relu6(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=jnp.float32, name="classifier")(x)


class UNet(nn.Module):
    """VGG16-BN encoder + 4 bilinear-up decoder blocks
    (reference core/models/unet.py:6-60)."""

    num_classes: int = 21
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype

        def block(x, ch, n, name):
            for i in range(n):
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                            use_bias=False, dtype=dt, param_dtype=jnp.float32,
                            name=f"{name}_c{i}")(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=dt,
                                 param_dtype=jnp.float32,
                                 name=f"{name}_b{i}")(x)
                x = nn.relu(x)
            return x

        e1 = block(x, 64, 2, "e1")
        e2 = block(nn.max_pool(e1, (2, 2), (2, 2)), 128, 2, "e2")
        e3 = block(nn.max_pool(e2, (2, 2), (2, 2)), 256, 3, "e3")
        e4 = block(nn.max_pool(e3, (2, 2), (2, 2)), 512, 3, "e4")
        e5 = block(nn.max_pool(e4, (2, 2), (2, 2)), 512, 3, "e5")

        def up(x, skip, ch, name):
            b, h, w, _ = skip.shape
            x = jax.image.resize(x, (b, h, w, x.shape[-1]), "bilinear")
            x = jnp.concatenate([x, skip], axis=-1)
            return block(x, ch, 2, name)

        d = up(e5, e4, 512, "d4")
        d = up(d, e3, 256, "d3")
        d = up(d, e2, 128, "d2")
        d = up(d, e1, 64, "d1")
        return nn.Conv(self.num_classes, (1, 1), dtype=dt,
                       param_dtype=jnp.float32, name="out")(d)
