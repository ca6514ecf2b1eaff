"""Vision Transformer.

The reference ships an *empty placeholder* (``core/models/vit.py``, 0 LoC);
here is a working TPU-friendly ViT — patchify as a strided conv (maps onto the
MXU), pre-norm blocks, learned position embeddings, class token."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class MlpBlock(nn.Module):
    dim: int
    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Dense(self.hidden, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(x)
        y = nn.gelu(y)
        return nn.Dense(self.dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="fc2")(y)


class Block(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, param_dtype=jnp.float32,
            name="attn")(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        return x + MlpBlock(self.dim, self.dim * self.mlp_ratio,
                            dtype=self.dtype, name="mlp")(y, train)


class ViT(nn.Module):
    num_classes: int = 1000
    patch: int = 16
    dim: int = 384
    depth: int = 12
    heads: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B = x.shape[0]
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    (self.patch, self.patch), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="patchify")(x)
        x = x.reshape(B, -1, self.dim)
        cls = self.param("cls", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim))
                             .astype(x.dtype), x], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, x.shape[1], self.dim))
        x = x + pos.astype(x.dtype)
        for i in range(self.depth):
            x = Block(self.dim, self.heads, dtype=self.dtype,
                      name=f"block{i}")(x, train)
        x = nn.LayerNorm(dtype=self.dtype, name="ln")(x)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=jnp.float32, name="head")(x[:, 0])
