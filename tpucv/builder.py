"""Resolve a model name to its (config instance, algorithm class, trainer
class) triple — same contract as the reference (``builder.py:8-31``).
Star imports trigger decorator registration, exactly as there."""

from __future__ import annotations

from tpucv.check import check_model_name
from tpucv.registry import config_registry, model_registry, trainer_registry

# imports for registration side effects
import tpucv.configs.model_cfgs  # noqa: F401
import tpucv.algorithms  # noqa: F401
import tpucv.trainer  # noqa: F401


def export_from_registry(name: str):
    check_model_name(name)
    cfg = config_registry["cfg_" + name]()       # instantiated
    algo = model_registry["model_" + name]       # class
    trainer = trainer_registry["trainer_" + name]  # class
    return cfg, algo, trainer
