"""Shared loss primitives."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_bce(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Numerically stable sigmoid binary cross-entropy
    (torch BCEWithLogitsLoss equivalent), elementwise."""
    return jnp.clip(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
