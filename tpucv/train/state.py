"""Train state + jitted train step factory.

Replaces the reference's ``BaseTrainer`` inner loop mechanics
(``core/trainer/base.py:214-263``): AMP GradScaler is unnecessary (bf16),
optimizer/scheduler objects become optax transforms, and the whole
fwd+loss+bwd+update is one jitted function sharded over the mesh (DP
all-reduce of gradients is inserted by XLA from the shardings — there is no
hand-written collective). EMA (reference ``ModelEMA``, lr_scheduler.py:55-84,
defined-but-unused there) is available as an optax-style decay on params.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any] = None

    @classmethod
    def create(cls, params, batch_stats, tx: optax.GradientTransformation,
               use_ema: bool = False):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            ema_params=jax.tree_util.tree_map(jnp.copy, params) if use_ema else None,
        )


LossFn = Callable[..., Tuple[jax.Array, Dict[str, jax.Array]]]
# signature: loss_fn(raw_outputs, batch) -> (scalar, metrics dict)


def make_train_step(
    apply_fn: Callable,
    loss_fn: LossFn,
    tx: optax.GradientTransformation,
    ema_decay: float = 0.0,
    donate: bool = True,
    state_sharding=None,
    grad_accum: int = 1,
    loss_batch_scaled: bool = False,
):
    """Build a jitted train step.

    ``apply_fn(variables, images, train=True, mutable=["batch_stats"])`` must
    return (raw_outputs, {"batch_stats": ...}).
    ``loss_fn(raw_outputs, batch)`` returns (scalar_loss, metrics).
    ``state_sharding``: optional TrainState-shaped pytree of NamedShardings
    (see parallel.mesh.plan_state_shardings) constraining the OUTPUT state —
    keeps e.g. ZeRO-sharded optimizer moments in their layout across steps
    instead of letting propagation reshard them.
    ``grad_accum``: G > 1 splits the batch into G sequential micro-batches
    (lax.scan) before the single optimizer update — activation memory drops
    ~G-fold at the same effective batch.
    ``loss_batch_scaled``: set True when ``loss_fn`` scales with the batch
    size (the YOLOv8-family ``mean * B`` losses): micro-gradients are then
    SUMMED (and the logged loss summed), which reproduces the gradient of
    one full-batch step. For mean-style losses (default False) they are
    averaged, which is the full-batch gradient for that convention.
    Getting this wrong scales the effective learning rate by G.
    Batch-stat models thread their stats through the micro-steps (same
    semantics as torch accumulation loops).
    """

    def _compute_factory(rng):
        def compute(params, bs, mb):
            raw, updates = apply_fn(
                {"params": params, "batch_stats": bs},
                mb["images"], train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss, metrics = loss_fn(raw, mb)
            # models without BN (ViT: LayerNorm only) return no batch_stats
            return loss, (metrics, updates.get("batch_stats", bs))
        return compute

    def step_fn(state: TrainState, batch: Dict[str, jax.Array]):
        dropout_rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
        compute = _compute_factory(dropout_rng)

        if grad_accum <= 1:
            (loss, (metrics, new_bs)), grads = jax.value_and_grad(
                compute, has_aux=True)(
                state.params, state.batch_stats, batch)
        else:
            G = grad_accum
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((G, x.shape[0] // G) + x.shape[1:]),
                batch)

            def body(carry, mb_idx):
                g_acc, bs = carry
                mb, idx = mb_idx
                c = _compute_factory(jax.random.fold_in(dropout_rng, idx))
                (loss, (metrics, new_bs)), g = jax.value_and_grad(
                    c, has_aux=True)(state.params, bs, mb)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                return (g_acc, new_bs), (loss, metrics)

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (g_sum, new_bs), (losses, metricss) = jax.lax.scan(
                body, (zeros, state.batch_stats),
                (micro, jnp.arange(G)))
            if loss_batch_scaled:
                grads = g_sum                  # Σ of B/G-scaled micro-grads
                loss = losses.sum()            # == mean_full * B
            else:
                grads = jax.tree_util.tree_map(lambda g: g / G, g_sum)
                loss = losses.mean()
            metrics = jax.tree_util.tree_map(lambda m: m.mean(), metricss)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if state.ema_params is not None and ema_decay > 0:
            d = ema_decay
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p * (1.0 - d), state.ema_params, new_params)
        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            opt_state=new_opt, ema_params=new_ema,
        )
        if state_sharding is not None:
            new_state = jax.tree_util.tree_map(
                jax.lax.with_sharding_constraint, new_state, state_sharding)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(apply_fn: Callable, loss_fn: LossFn):
    def step_fn(state: TrainState, batch: Dict[str, jax.Array]):
        raw = apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["images"], train=False,
        )
        loss, metrics = loss_fn(raw, batch)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return metrics

    return jax.jit(step_fn)
