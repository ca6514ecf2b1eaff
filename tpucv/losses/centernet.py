"""CenterNet loss: penalty-reduced focal + masked L1 (reference
``core/loss/centernet_loss.py``: FocalLoss :5-26, RegL1Loss w/ gather_feat
:29-43, CombinedLoss :46-67)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tpucv.targets.centernet import CenterNetTargets


def penalty_reduced_focal(hm_logits: jax.Array, hm_true: jax.Array,
                          eps: float = 1e-4) -> jax.Array:
    """CornerNet/CenterNet focal: positives where hm_true == 1, negatives
    weighted by (1 - hm_true)^4. The 1e-4 sigmoid clamp matches the
    reference (centernet_loss.py:63)."""
    p = jax.nn.sigmoid(hm_logits.astype(jnp.float32))
    p = jnp.clip(p, eps, 1 - eps)
    pos = hm_true >= 1.0 - 1e-6
    pos_loss = -jnp.log(p) * (1 - p) ** 2
    neg_loss = -jnp.log(1 - p) * p**2 * (1 - hm_true) ** 4
    n_pos = jnp.maximum(pos.sum(), 1.0)
    return (jnp.where(pos, pos_loss, neg_loss).sum()) / n_pos


def gather_feat(feat: jax.Array, ind: jax.Array) -> jax.Array:
    """(B, H*W, C) gather at (B, M) indices -> (B, M, C)
    (reference RegL1Loss.gather_feat, centernet_loss.py:33-38)."""
    return jnp.take_along_axis(
        feat, ind[..., None].astype(jnp.int32), axis=1)


def masked_l1(pred_map: jax.Array, target: jax.Array, ind: jax.Array,
              mask: jax.Array) -> jax.Array:
    """pred_map (B, H, W, C) gathered at centres vs target (B, M, C).

    Normalised by the *expanded* mask count ``C * n_pos + 1e-4`` exactly like
    the reference (centernet_loss.py:31-35: the mask is expanded over the C
    channels before ``mask.sum()``)."""
    B, H, W, C = pred_map.shape
    flat = pred_map.reshape(B, H * W, C).astype(jnp.float32)
    # broadcast (B, M, 1) index — a repeated index tensor lowers the gather
    # to scalar granularity on TPU (scripts/probe_gather.py)
    picked = jnp.take_along_axis(
        flat, ind[..., None].astype(jnp.int32), axis=1)
    l1 = jnp.abs(picked - target).sum(-1)
    n = mask.astype(jnp.float32).sum() * C + 1e-4
    return jnp.where(mask, l1, 0.0).sum() / n


def centernet_loss(
    output: jax.Array,          # (B, H, W, C+4) [hm logits, wh, reg]
    targets: CenterNetTargets,
    num_classes: int,
    hm_weight: float = 1.0,
    wh_weight: float = 0.1,
    off_weight: float = 1.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    # Channel contract matches the reference loss/decode (centernet_loss.py:
    # 58-61, centernet.py:274-276): offsets live at [C:C+2] and sizes at
    # [-2:]. (The reference model concatenates its heads as [hm, "wh",
    # "reg"], so the head *named* wh learns offsets — the loss/decode slice
    # convention, not the head name, is the contract that matters for
    # checkpoint-import parity.)
    hm = output[..., :num_classes]
    reg = output[..., num_classes:num_classes + 2]
    wh = output[..., num_classes + 2:num_classes + 4]
    l_hm = penalty_reduced_focal(hm, targets.heatmap)
    l_wh = masked_l1(wh, targets.wh, targets.ind, targets.mask)
    l_off = masked_l1(reg, targets.reg, targets.ind, targets.mask)
    total = hm_weight * l_hm + wh_weight * l_wh + off_weight * l_off
    return total, {"hm_loss": l_hm, "wh_loss": l_wh, "off_loss": l_off}
