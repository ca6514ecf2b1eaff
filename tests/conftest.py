"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no tests at all (SURVEY.md §4); here every kernel/assigner/
model gets unit coverage, and multi-chip sharding is validated with
``xla_force_host_platform_device_count`` — the idiomatic JAX substitute for
fake distributed backends.

Note: this environment preloads jax and registers a remote-TPU backend in
every process (JAX_PLATFORMS=axon); we must override the *config* after
import, before any backend is initialised, or every tiny test compile
round-trips to the remote TPU.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (possibly preloaded by sitecustomize)

jax.config.update("jax_platforms", "cpu")
