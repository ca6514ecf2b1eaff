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
        (mirrors reference ckpt.py:69-75 tolerance). A saved ``quant``
        collection (int8 deploy bundle, tpucv/quant.py) rides along even
        when the init-variables template doesn't have one, so quantized
        checkpoints load through the same CLI path as float ones."""
        with open(path, "rb") as f:
            raw = f.read()
        state_dict = serialization.msgpack_restore(raw)
        try:
            out = serialization.from_bytes(template, raw)
        except Exception:
            # a full TrainState bundle: pull params/batch_stats out
            out = {
                "params": serialization.from_state_dict(
                    template["params"], state_dict["params"]),
                "batch_stats": serialization.from_state_dict(
                    template["batch_stats"], state_dict["batch_stats"]),
            }
        if isinstance(state_dict, dict) and "quant" in state_dict \
                and "quant" not in out:
            # flax restore silently drops keys absent from the template
            out = dict(out, quant=state_dict["quant"])
        return out


def _overlay_matching(init: Any, loaded: Any, stats: dict, prefix: str = ""):
    """Shape-matched partial overlay (reference ``load_pretrained``,
    core/utils/ckpt.py:19-36): leaves present in ``loaded`` with an equal
    shape replace the init value; everything else keeps its init."""
    import numpy as np

    if isinstance(init, dict):
        if not isinstance(loaded, dict):
            return init
        return {k: _overlay_matching(v, loaded.get(k), stats, f"{prefix}{k}/")
                for k, v in init.items()}
    if loaded is None:
        return init
    init_arr = np.asarray(init)
    arr = np.asarray(loaded)
    if arr.shape != init_arr.shape:
        stats["skipped"].append(prefix.rstrip("/"))
        return init
    stats["loaded"] += 1
    return arr.astype(init_arr.dtype)


def load_pretrained(variables: dict, path: str,
                    model_name: Optional[str] = None,
                    logger: Any = None) -> dict:
    """Initialise ``variables`` from a pretrained-weights file.

    Accepts either a tpucv-saved variables/TrainState file (msgpack) or a
    torch ``.pth``/``.pt`` state_dict, which is routed through the matching
    ``tpucv.ckpt.importer`` converter by ``model_name``. Loading is partial
    and shape-matched like the reference's ``CheckPoint.load_pretrained``
    (core/utils/ckpt.py:19-36) + ``use_pretrained_model`` decorator
    (core/trainer/base.py:16-28): mismatched or missing leaves keep their
    init values, so a backbone-only file fine-tunes a fresh head.
    """
    from flax import serialization as ser

    stats = {"loaded": 0, "skipped": []}
    if path.endswith((".pth", ".pt")):
        import torch

        from tpucv.ckpt import importer as imp

        raw = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(raw, dict) and "model_state_dict" in raw:
            raw = raw["model_state_dict"]
        sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
              for k, v in raw.items()}
        converters = {"yolo8_det": imp.import_yolov8,
                      "yolo7": imp.import_yolov7,
                      "ssd": imp.import_ssd,
                      "centernet": getattr(imp, "import_centernet",
                                           imp.import_dla34),
                      "deeplabv3plus": getattr(imp, "import_deeplab", None)}
        conv = converters.get(model_name)
        if conv is None:
            raise ValueError(
                f"no torch importer for model {model_name!r}; convert the "
                f"file with convert_model.py first")
        loaded = conv(sd)
    else:
        with open(path, "rb") as f:
            restored = ser.msgpack_restore(f.read())
        if "params" not in restored:  # bare params pytree (no wrapper dict)
            restored = {"params": restored, "batch_stats": {}}
        loaded = restored

    out = {
        "params": _overlay_matching(
            dict(variables["params"]), loaded.get("params", {}), stats),
        "batch_stats": _overlay_matching(
            dict(variables.get("batch_stats", {})),
            loaded.get("batch_stats", {}), stats),
    }
    msg = (f"pretrained: loaded {stats['loaded']} tensors from {path}"
           + (f", skipped {len(stats['skipped'])} shape-mismatched"
              if stats["skipped"] else ""))
    (logger.info if logger else print)(msg)
    return out
