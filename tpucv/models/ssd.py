"""SSD300/512-VGG16 detector, TPU-native, structurally exact to the reference.

Re-design of the reference network (``core/models/ssd_model.py``) with
matching parameterisation so reference-trained weights import losslessly:
  * VGG16-BN backbone: conv(bias)+BN+ReLU blocks, 'C' ceil-mode pool after
    block 3 (:6-57); conv4_3 feature tapped after its ReLU (extract index 32)
  * pool5 3x3 s1 p1 + dilated conv6 / 1x1 conv7 — bias+ReLU, no BN
  * L2-normalised conv4_3 with learned scale init 20 (:112-128)
  * extra layers: plain biased convs with NO activation (:60-109 — a
    reference quirk kept for parity), tapped after every second conv
  * 6(+1) loc/conf 3x3 heads -> (B, P, 4) + (B, P, nc); 8732 priors at 300

NHWC + explicit asymmetric pool padding reproduce torch ceil_mode (75 -> 38).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

VGG16_BLOCKS = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

EXTRA_SPECS = {
    300: [(256, 1, 1, 0), (512, 3, 2, 1), (128, 1, 1, 0), (256, 3, 2, 1),
          (128, 1, 1, 0), (256, 3, 1, 0), (128, 1, 1, 0), (256, 3, 1, 0)],
    512: [(256, 1, 1, 0), (512, 3, 2, 1), (128, 1, 1, 0), (256, 3, 2, 1),
          (128, 1, 1, 0), (256, 3, 2, 1), (128, 1, 1, 0), (256, 3, 2, 1),
          (128, 1, 1, 0), (256, 4, 1, 1)],
}


def max_pool(x, k=2, s=2, ceil=False, pad_same=False):
    """torch-style MaxPool2d; ceil pads bottom/right (reference pool 'C')."""
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

        def conv(x, feat, k, s, p, name):
            return nn.Conv(feat, (k, k), (s, s), padding=((p, p), (p, p)),
                           use_bias=True, dtype=dt, param_dtype=jnp.float32,
                           name=name)(x)

        # VGG16-BN backbone (reference layer order; conv has bias AND BN)
        from tpucv import quant

        ci = 0
        f1 = None
        for bi, (ch, n) in enumerate(VGG16_BLOCKS):
            for _ in range(n):
                # int8 PTQ hooks ride in quant.conv_bn; the conv bias
                # folds into the quantized bias alongside BN
                x = quant.conv_bn(self, x, features=ch, kernel=3, padding=1,
                                  use_bias=True, conv=f"vgg{ci}_conv",
                                  bn=f"vgg{ci}_bn", dtype=dt, train=train)
                x = nn.relu(x)
                ci += 1
            if bi == 3:
                f1 = x                                # conv4_3 after ReLU
                x = max_pool(x)
            elif bi == 2:
                x = max_pool(x, ceil=True)            # 'C' pool: 75 -> 38
            elif bi < 4:
                x = max_pool(x)
        x = max_pool(x, k=3, s=1, pad_same=True)      # pool5
        # dilated conv6 / conv7 — bias + ReLU, no BN (reference :27-32);
        # quant.conv_biased carries the int8 hooks (bias-only dequant)
        x = quant.conv_biased(self, x, features=1024, kernel=3, padding=6,
                              dilation=6, conv="conv6", dtype=dt,
                              train=train)
        x = nn.relu(x)
        x = quant.conv_biased(self, x, features=1024, kernel=1,
                              conv="conv7", dtype=dt, train=train)
        f2 = nn.relu(x)

        f1 = L2Normalize(name="l2norm")(f1)
        feats = [f1, f2]

        # extras: plain biased convs, no activation (reference quirk)
        x = f2
        for j, (ch, k, s, p) in enumerate(EXTRA_SPECS[self.input_size]):
            x = conv(x, ch, k, s, p, f"extra{j + 1}")
            if j % 2 == 1:
                feats.append(x)

        if self.input_size == 300:
            n_boxes = [4, 6, 6, 6, 4, 4]
        else:
            n_boxes = [4, 6, 6, 6, 6, 4, 4]
        locs, confs = [], []
        for i, (f, nb) in enumerate(zip(feats, n_boxes)):
            loc = conv(f, nb * 4, 3, 1, 1, f"loc{i}")
            cf = conv(f, nb * self.num_classes, 3, 1, 1, f"conf{i}")
            b = f.shape[0]
            locs.append(loc.reshape(b, -1, 4))
            confs.append(cf.reshape(b, -1, self.num_classes))
        return (jnp.concatenate(locs, axis=1),
                jnp.concatenate(confs, axis=1))