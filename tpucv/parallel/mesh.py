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


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Put a host batch onto the mesh, sharded along the leading axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
