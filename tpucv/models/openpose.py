"""CPM/OpenPose pose network (reference parked it unfinished in
``core/algorithms/openpose.py:1-105``: VGG19 feature extractor + 6 refinement
stages of PAF + heatmap branches; no loss/trainer there either — provided here
at the same capability level, as a runnable network)."""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpucv.models.extras import VGG

Dtype = Any


class ConvBlock(nn.Module):
    feat: int
    k: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.k // 2
        x = nn.Conv(self.feat, (self.k, self.k), padding=((p, p), (p, p)),
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        return nn.relu(x)


class Stage(nn.Module):
    """One refinement stage: 5 convs + 2 1x1 heads per branch."""

    out_ch: int
    first: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = 3 if self.first else 7
        hidden = 128
        for i in range(3 if self.first else 5):
            x = ConvBlock(hidden, k, dtype=self.dtype, name=f"c{i}")(x)
        x = ConvBlock(512 if self.first else 128, 1, dtype=self.dtype,
                      name="pre")(x)
        return nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="out")(x)


class CPM(nn.Module):
    """Returns (pafs (B,H/8,W/8,2*n_limbs), heatmaps (B,H/8,W/8,n_kpts+1))."""

    n_keypoints: int = 18
    n_limbs: int = 19
    n_stages: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # VGG19 through conv4_2 (end_layer 12 convs + pools ~ index 23)
        f = VGG(depth=19, end_layer=13, dtype=self.dtype, name="vgg")(x, train)
        f = ConvBlock(256, 3, dtype=self.dtype, name="cpm0")(f)
        f = ConvBlock(128, 3, dtype=self.dtype, name="cpm1")(f)

        paf_ch = 2 * self.n_limbs
        hm_ch = self.n_keypoints + 1
        paf = Stage(paf_ch, first=True, dtype=self.dtype, name="paf0")(f)
        hm = Stage(hm_ch, first=True, dtype=self.dtype, name="hm0")(f)
        for s in range(1, self.n_stages):
            cat = jnp.concatenate([f, paf, hm], axis=-1)
            paf = Stage(paf_ch, dtype=self.dtype, name=f"paf{s}")(cat)
            hm = Stage(hm_ch, dtype=self.dtype, name=f"hm{s}")(cat)
        return paf, hm
