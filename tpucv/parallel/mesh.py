"""Device mesh + sharding rules — the distributed layer the reference never
had (SURVEY.md §2.12/§5.8: the reference is strictly single-GPU).

Design: a 2-D ``(data, model)`` mesh over ICI. These CNN zoos (3M-68M params)
are batch-bound, so ``data`` carries the parallelism (batch sharded,
gradients all-reduced by XLA via sharding propagation); the ``model`` axis is
available for channel-sharding the widest conv kernels of the l/x scales but
defaults to size 1. Multi-host: ``jax.distributed.initialize`` then the same
mesh spans all processes; DCN is handled transparently by the mesh ordering.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices")
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def spatial_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) images: batch over ``data`` AND height over ``model`` —
    XLA spatial partitioning. Convolution halo exchanges become
    collective-permutes on ICI inserted by the SPMD partitioner; use when a
    single image's activations exceed one chip's HBM (large inputs /
    segmentation) instead of shrinking the batch."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rule(path: Any, leaf: jax.Array, mesh: Mesh) -> NamedSharding:
    """Shard conv kernels' output-channel dim over ``model`` when it divides
    evenly and the kernel is large; replicate everything else.

    With ``n_model == 1`` this degenerates to full replication (pure DP).
    """
    n_model = mesh.shape[MODEL_AXIS]
    if n_model > 1 and leaf.ndim == 4 and leaf.size >= 1 << 16 \
            and leaf.shape[-1] % n_model == 0:
        return NamedSharding(mesh, P(None, None, None, MODEL_AXIS))
    return NamedSharding(mesh, P())


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Apply ``param_sharding_rule`` across a pytree of parameters."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: jax.device_put(x, param_sharding_rule(p, x, mesh)), params
    )


def opt_state_sharding_rule(leaf: jax.Array, mesh: Mesh,
                            min_size: int = 1 << 12) -> NamedSharding:
    """ZeRO-1: shard an optimizer-moment leaf over the DATA axis.

    Adam's m/v are exact param copies and the largest replicated state in
    DP training (2x params in f32); sharding them over the data axis cuts
    per-chip optimizer HBM ~n_data-fold. The sharding axis is semantically
    free (the update is elementwise), so pick the largest dim divisible by
    n_data — for conv kernels that is the trailing C_out, for biases dim 0.
    XLA turns the sharded update + replicated-params write into a
    reduce-scatter / all-gather pair on ICI (the ZeRO-1 communication
    pattern) via sharding propagation — no hand-written collectives.
    """
    n_data = mesh.shape[DATA_AXIS]
    if n_data > 1 and leaf.ndim >= 1 and leaf.size >= min_size:
        # prefer the last divisible dim (channels-last layouts)
        for ax in range(leaf.ndim - 1, -1, -1):
            if leaf.shape[ax] % n_data == 0:
                spec = [None] * leaf.ndim
                spec[ax] = DATA_AXIS
                return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def plan_state_shardings(state: Any, mesh: Mesh,
                         zero_opt: bool = False) -> Any:
    """NamedSharding pytree matching a TrainState: params/batch_stats/EMA
    via ``param_sharding_rule`` (+replication), opt_state via
    ``opt_state_sharding_rule`` when zero_opt, else replicated. Used both
    to place the initial state and as the train step's output constraint
    (so XLA keeps the layout stable across steps instead of resharding)."""
    def for_params(tree):
        return jax.tree_util.tree_map_with_path(
            lambda p, x: param_sharding_rule(p, x, mesh), tree)

    def for_opt(tree):
        rule = (lambda x: opt_state_sharding_rule(x, mesh)) if zero_opt \
            else (lambda x: replicated(mesh))
        return jax.tree_util.tree_map(rule, tree)

    rep = replicated(mesh)
    return state.replace(
        step=rep,
        params=for_params(state.params),
        batch_stats=jax.tree_util.tree_map(lambda x: rep, state.batch_stats),
        opt_state=for_opt(state.opt_state),
        ema_params=None if state.ema_params is None
        else for_params(state.ema_params),
    )


def shard_state(state: Any, mesh: Mesh, zero_opt: bool = False) -> Any:
    """device_put a TrainState according to ``plan_state_shardings``."""
    plan = plan_state_shardings(state, mesh, zero_opt)
    return jax.tree_util.tree_map(jax.device_put, state, plan)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Put a host batch onto the mesh, sharded along the leading axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
