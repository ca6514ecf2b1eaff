"""SSD300/512-VGG16 detector, TPU-native.

Re-design of the reference network (``core/models/ssd_model.py``): inline
VGG16-BN backbone with dilated conv6/7 (:6-57), extra feature layers for
300/512 (:60-109), L2-normalised conv4_3 (:112-128), and 6(+1) loc/conf heads
producing (B, num_priors, 4) + (B, num_priors, nc) (:131-191).

NHWC + explicit asymmetric pool padding reproduces torch's ceil_mode pooling
(pool3: 75 -> 38), so prior counts line up exactly (8732 for 300).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvBNReLU(nn.Module):
    feat: int
    k: int = 3
    s: int = 1
    dilation: int = 1
    pad: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.pad if self.pad is not None else self.dilation * (self.k - 1) // 2
        x = nn.Conv(self.feat, (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)),
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


def max_pool(x, k=2, s=2, ceil=False, pad_same=False):
    """torch-style MaxPool2d; ceil pads bottom/right
    (reference pool3 ceil_mode, ssd_model.py:18)."""
    h, w = x.shape[1:3]
    if pad_same:  # k=3 s=1 p=1 pool5
        pads = ((0, 0), (1, 1), (1, 1), (0, 0))
    elif ceil and (h % s or w % s):
        pads = ((0, 0), (0, s - h % s), (0, s - w % s), (0, 0))
    else:
        pads = ((0, 0), (0, 0), (0, 0), (0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), pads)


class L2Normalize(nn.Module):
    """Channelwise L2 norm with learned scale, init 20
    (reference ssd_model.py:112-128)."""

    init_scale: float = 20.0

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            "scale", lambda _k: jnp.full((x.shape[-1],), self.init_scale))
        n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                             keepdims=True)) + 1e-10
        return (x / n.astype(x.dtype)) * scale.astype(x.dtype)


class SSD(nn.Module):
    """Returns (loc (B, P, 4), conf (B, P, nc)) raw outputs."""

    num_classes: int = 21               # includes background
    input_size: int = 300               # 300 | 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        C = lambda f, **kw: ConvBNReLU(f, dtype=dt, **kw)

        # VGG16 through conv4_3 (feature 1) and conv7 (feature 2)
        for i in range(2):
            x = C(64, name=f"c1_{i}")(x, train)
        x = max_pool(x)
        for i in range(2):
            x = C(128, name=f"c2_{i}")(x, train)
        x = max_pool(x)
        for i in range(3):
            x = C(256, name=f"c3_{i}")(x, train)
        x = max_pool(x, ceil=True)                  # 75 -> 38
        for i in range(3):
            x = C(512, name=f"c4_{i}")(x, train)
        f1 = L2Normalize(name="l2norm")(x)          # conv4_3 feature
        x = max_pool(x)
        for i in range(3):
            x = C(512, name=f"c5_{i}")(x, train)
        x = max_pool(x, k=3, s=1, pad_same=True)    # pool5 3x3 s1
        x = C(1024, dilation=6, name="conv6")(x, train)
        f2 = C(1024, k=1, name="conv7")(x, train)

        feats = [f1, f2]
        # extra layers (reference ExtraLayer :60-109)
        x = f2
        extra_specs_300 = [
            (256, 512, 2, 1), (128, 256, 2, 1), (128, 256, 1, 0), (128, 256, 1, 0)]
        extra_specs_512 = [
            (256, 512, 2, 1), (128, 256, 2, 1), (128, 256, 2, 1),
            (128, 256, 2, 1), (128, 256, 2, 1)]
        specs = extra_specs_300 if self.input_size == 300 else extra_specs_512
        for j, (c1, c2, s, p) in enumerate(specs):
            x = C(c1, k=1, name=f"extra{j}_1")(x, train)
            x = C(c2, k=3, s=s, pad=p, name=f"extra{j}_2")(x, train)
            feats.append(x)

        # heads: boxes per cell per level
        if self.input_size == 300:
            n_boxes = [4, 6, 6, 6, 4, 4]
        else:
            n_boxes = [4, 6, 6, 6, 6, 4, 4]
        locs, confs = [], []
        for i, (f, nb) in enumerate(zip(feats, n_boxes)):
            loc = nn.Conv(nb * 4, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                          param_dtype=jnp.float32, name=f"loc{i}")(f)
            conf = nn.Conv(nb * self.num_classes, (3, 3),
                           padding=((1, 1), (1, 1)), dtype=dt,
                           param_dtype=jnp.float32, name=f"conf{i}")(f)
            b = f.shape[0]
            locs.append(loc.reshape(b, -1, 4))
            confs.append(conf.reshape(b, -1, self.num_classes))
        return (jnp.concatenate(locs, axis=1),
                jnp.concatenate(confs, axis=1))
