"""SSD MultiBox loss with batch-global hard negative mining.

Value-parity with reference ``MultiBoxLossV2`` (``core/loss/multi_box_loss.py:
77-192``): smooth-L1 localisation on positives + softmax CE, with the batch-
global hard-negative selection ranked by *non-background probability mass*
(:168-180), per-image negative caps ``min(ratio*pos_i, A-pos_i)`` (:146),
the 100-negatives fallback when no image has positives (:156), normalisation
by ``sum(max(pos_i, 1))`` (:185-188), and the ``alpha=0.5`` conf/loc blend
(:191). Implemented with static-shape argsort + rank masks instead of the
reference's data-dependent ``topk(k=num_neg_batch)``.
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
    alpha: float = 0.5,
    negatives_for_hard: float = 100.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    B, A, nc = conf_pred.shape
    conf_pred = conf_pred.astype(jnp.float32)
    loc_pred = loc_pred.astype(jnp.float32)
    posf = pos_mask.astype(jnp.float32)

    # per-prior CE on clamped softmax probs (reference _softmax_loss :103-106)
    probs = jnp.clip(jax.nn.softmax(conf_pred, axis=-1), 1e-7)
    # one-hot reduction instead of a cross-lane take_along_axis pick
    # (serial-ish on TPU); exact: one 1.0 per row
    nc = conf_pred.shape[-1]
    ce = -(jnp.log(probs)
           * jax.nn.one_hot(cls_true, nc, dtype=probs.dtype)).sum(-1)  # (B, A)

    # localisation smooth-L1 on positives (reference :96-101,131-137)
    l1 = smooth_l1(loc_pred - loc_true).sum(-1)                 # (B, A)
    pos_loc = (l1 * posf).sum()
    pos_conf = (ce * posf).sum()

    # per-image negative budget (reference :140-156)
    num_pos = posf.sum(axis=1)                                  # (B,)
    num_neg = jnp.minimum(neg_pos_ratio * num_pos, A - num_pos)
    has_min = (num_neg > 0).any()
    num_neg_batch = jnp.where(has_min, num_neg.sum(), negatives_for_hard)

    # hard negatives ranked by non-background probability mass (:168-177)
    max_confs = probs[..., 1:].sum(-1) * (1.0 - posf)           # (B, A)
    flat_scores = max_confs.reshape(-1)
    order = jnp.argsort(-flat_scores)                           # descending
    ce_sorted = ce.reshape(-1)[order]
    rank = jnp.arange(B * A, dtype=jnp.float32)
    neg_conf = jnp.where(rank < num_neg_batch, ce_sorted, 0.0).sum()

    # normalisation: zero-positive images count as 1 (reference :185-188)
    norm = jnp.where(num_pos != 0, num_pos, 1.0).sum()
    loss_conf = (pos_conf + neg_conf) / norm
    loss_loc = pos_loc / norm
    total = loss_conf * (1.0 - alpha) + loss_loc * alpha
    return total, {"loc_loss": loss_loc, "conf_loss": loss_conf,
                   "num_pos": num_pos.sum()}
