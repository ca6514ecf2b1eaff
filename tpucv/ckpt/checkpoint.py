"""Checkpoint save/load — the reference's ``CheckPoint`` util
(``core/utils/ckpt.py``) re-done for JAX pytrees.

The bundle is the whole TrainState (params, batch_stats, opt_state, step,
ema) — same scope as the reference's {model, optimizer, scheduler, warm_up}
dict (and without its bug of loading warm_up state into the scheduler,
ckpt.py:65-66). Orbax handles atomic on-disk layout; ``load_pure`` restores
params(+batch_stats) only, like reference ``load_pure`` (ckpt.py:69-75).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
from flax import serialization


class CheckPoint:
    @staticmethod
    def save(state: Any, path: str) -> str:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        data = serialization.to_bytes(jax.device_get(state))
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return path

    @staticmethod
    def load(path: str, template: Any) -> Any:
        with open(path, "rb") as f:
            return serialization.from_bytes(template, f.read())

    @staticmethod
    def save_pure(variables: Any, path: str) -> str:
        """Save inference variables {params, batch_stats} only."""
        return CheckPoint.save(variables, path)

    @staticmethod
    def load_pure(path: str, template: Any) -> Any:
        """Accepts either a pure variables file or a full-state file
        (mirrors reference ckpt.py:69-75 tolerance)."""
        with open(path, "rb") as f:
            raw = f.read()
        try:
            return serialization.from_bytes(template, raw)
        except Exception:
            # maybe a full TrainState: pull params/batch_stats out
            state_dict = serialization.msgpack_restore(raw)
            return {
                "params": serialization.from_state_dict(
                    template["params"], state_dict["params"]),
                "batch_stats": serialization.from_state_dict(
                    template["batch_stats"], state_dict["batch_stats"]),
            }
