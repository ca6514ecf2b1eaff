"""Orbax checkpoint backend — sharding-aware, async-capable persistence for
TrainState pytrees (the TPU-ecosystem-native layer behind the simple
``CheckPoint`` API; SURVEY §5.4's designated equivalent of the reference's
torch.save bundles)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


class OrbaxCheckPoint:
    """Directory-per-step checkpoints with retention.

    save(state, step) / load(step, template) / latest_step().
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, state: Any, step: int, wait: bool = True) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def load(self, step: Optional[int] = None, template: Any = None) -> Any:
        import orbax.checkpoint as ocp

        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
