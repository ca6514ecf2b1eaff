"""Device selection (reference ``core/utils/device.py:4-28`` picks the CUDA
device with the most free memory; on TPU all chips are equivalent so this is
a thin introspection helper)."""

from __future__ import annotations

import jax


def get_device(prefer: str = "tpu"):
    """Return the first device of the preferred platform, else default."""
    for d in jax.devices():
        if d.platform == prefer:
            return d
    return jax.devices()[0]


def device_summary() -> str:
    ds = jax.devices()
    return (f"{len(ds)} x {ds[0].device_kind} ({jax.default_backend()}), "
            f"{jax.process_count()} process(es)")
