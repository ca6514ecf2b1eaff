"""Multi-host / multi-slice initialisation.

The distributed layer the reference never had (SURVEY §5.8). On a multi-host
TPU pod slice each process calls ``initialize()`` once before any jax use;
the (data, model) mesh from ``tpucv.parallel.mesh`` then spans all hosts'
devices and XLA routes collectives over ICI within a slice and DCN across
slices — no NCCL-style plumbing in user code.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


#: Environment markers that identify a real multi-host TPU pod slice. When
#: any of these is set, a failed ``jax.distributed.initialize`` means the
#: pod is misconfigured — proceeding single-process would silently train
#: with the wrong world size, so we re-raise instead of swallowing.
_POD_ENV_MARKERS = (
    "TPU_WORKER_HOSTNAMES",      # set by the TPU VM runtime on pod slices
    "TPU_WORKER_ID",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS",
    "CLOUD_TPU_TASK_ID",
)


def _in_pod_environment() -> bool:
    return any(os.environ.get(k) for k in _POD_ENV_MARKERS)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` with TPU-pod auto-detection.

    On Cloud TPU the arguments are discovered from the metadata server /
    environment, so bare ``initialize()`` is correct; arguments are accepted
    for CPU/GPU clusters and tests.

    Failure policy: init errors are swallowed only for plain single-process
    runs (this repo's CI, a lone dev VM). They re-raise when the caller
    asked for a multi-process world (``num_processes > 1``) or when pod
    environment markers show this IS a pod — a pod falling back to
    single-process would train with the wrong world size in silence.
    """
    if jax.process_count() > 1:
        return  # already initialised
    kwargs = {}
    if coordinator_address:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except Exception:
        if num_processes not in (None, 1) or _in_pod_environment():
            raise
        # single-process runs (and this repo's CI) need no coordinator
    if num_processes and jax.process_count() != num_processes:
        raise RuntimeError(
            f"jax.distributed came up with process_count="
            f"{jax.process_count()} but the caller expected "
            f"{num_processes}; the pod slice is misconfigured")


def is_primary() -> bool:
    """True on the process that should write checkpoints / logs / eval json
    (host 0 — the aggregation point for eval shards, SURVEY §5.8)."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """The slice of a globally-sharded batch this host should feed."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
