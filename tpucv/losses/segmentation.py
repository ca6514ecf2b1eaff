"""Segmentation losses: CE and focal with ignore_index (reference
``core/loss/focal_loss.py:6-22`` + the CE factory in
``core/algorithms/segmentation_2d.py:42-76``)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _valid_ce(logits: jax.Array, labels: jax.Array, num_classes: int,
              ignore_index: int):
    valid = (labels != ignore_index) & (labels >= 0) & (labels < num_classes)
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # one-hot reduction instead of a cross-lane take_along_axis pick
    # (serial-ish on TPU); exact: one 1.0 per pixel row
    ce = -(logp * jax.nn.one_hot(safe, num_classes,
                                 dtype=logp.dtype)).sum(-1)
    return ce, valid, logp, safe


def cross_entropy_loss(logits: jax.Array, labels: jax.Array,
                       ignore_index: int = 255
                       ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    nc = logits.shape[-1]
    ce, valid, _, _ = _valid_ce(logits, labels, nc, ignore_index)
    n = jnp.maximum(valid.sum(), 1)
    loss = jnp.where(valid, ce, 0.0).sum() / n
    return loss, {"ce_loss": loss}


def focal_loss(logits: jax.Array, labels: jax.Array, alpha: float = 0.25,
               gamma: float = 2.0, ignore_index: int = 255
               ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    nc = logits.shape[-1]
    ce, valid, logp, safe = _valid_ce(logits, labels, nc, ignore_index)
    pt = jnp.exp(-ce)
    focal = alpha * (1 - pt) ** gamma * ce
    n = jnp.maximum(valid.sum(), 1)
    loss = jnp.where(valid, focal, 0.0).sum() / n
    return loss, {"focal_loss": loss}
