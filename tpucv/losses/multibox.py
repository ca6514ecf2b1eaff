"""SSD MultiBox loss with batch-global hard negative mining.

Parity with reference ``MultiBoxLossV2`` (``core/loss/multi_box_loss.py:
77-192``): smooth-L1 localisation on positives + softmax CE with the batch-
global top-k hard-negative selection (:179) at ``neg_pos_ratio``:1 —
implemented with a static top-k over masked losses instead of ragged sorting.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def smooth_l1(x: jax.Array, beta: float = 1.0) -> jax.Array:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def multibox_loss(
    loc_pred: jax.Array,     # (B, A, 4)
    conf_pred: jax.Array,    # (B, A, nc) logits (class 0 = background)
    loc_true: jax.Array,     # (B, A, 4)
    cls_true: jax.Array,     # (B, A) int32
    pos_mask: jax.Array,     # (B, A) bool
    neg_pos_ratio: int = 3,
    alpha: float = 1.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    B, A, nc = conf_pred.shape
    conf_pred = conf_pred.astype(jnp.float32)
    loc_pred = loc_pred.astype(jnp.float32)

    n_pos = jnp.maximum(pos_mask.sum(), 1).astype(jnp.float32)

    # localisation
    l1 = smooth_l1(loc_pred - loc_true).sum(-1)
    loss_loc = jnp.where(pos_mask, l1, 0.0).sum() / n_pos

    # classification CE per prior
    logp = jax.nn.log_softmax(conf_pred, axis=-1)
    ce = -jnp.take_along_axis(logp, cls_true[..., None], axis=-1)[..., 0]

    pos_ce = jnp.where(pos_mask, ce, 0.0).sum()

    # batch-global hard negatives: top (ratio * n_pos) background losses
    neg_ce_flat = jnp.where(pos_mask, 0.0, ce).reshape(-1)
    k = neg_ce_flat.shape[0]
    sorted_neg = -jnp.sort(-neg_ce_flat)            # descending
    n_neg = jnp.minimum(neg_pos_ratio * n_pos, k).astype(jnp.int32)
    rank = jnp.arange(k)
    neg_ce = jnp.where(rank < n_neg, sorted_neg, 0.0).sum()

    loss_conf = (pos_ce + neg_ce) / n_pos
    total = loss_conf + alpha * loss_loc
    return total, {"loc_loss": loss_loc, "conf_loss": loss_conf,
                   "num_pos": n_pos}
