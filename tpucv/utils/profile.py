"""Profiling helpers.

Parity with the reference's ``Profile`` timing context
(``core/utils/ultralytics_ops.py:15-51``, cuda.synchronize there) plus the
TPU-native path: ``jax.profiler`` traces for xprof/TensorBoard.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class Profile(contextlib.ContextDecorator):
    """Usable as ``with Profile() as p:`` or ``@Profile()``; accumulates
    elapsed seconds in ``.t``. Fences the device by fetching ``fence`` (a
    jax array) when provided — a bare block_until_ready is not a reliable
    fence on every backend."""

    def __init__(self, t: float = 0.0):
        self.t = t

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.dt = time.perf_counter() - self.start
        self.t += self.dt
        return False

    def fence(self, x) -> None:
        jax.device_get(jax.tree_util.tree_leaves(x)[-1])


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context — open the result in TensorBoard/xprof
    (TPU-native replacement for the reference's cuda timing)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
