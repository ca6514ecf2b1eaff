"""PyTorch -> flax weight importer (replaces ``convert_model.py``'s
checkpoint/ultralytics extraction, reference convert_model.py:9-68, and feeds
the golden-parity tests of SURVEY §4).

Layout conversions:
  * conv weight OIHW -> HWIO; depthwise torch (O, 1, H, W) -> HWIO (H, W, 1, O)
  * BN: weight->scale, bias->bias (params); running_mean/var -> batch_stats
  * linear: (out, in) -> (in, out)

``import_yolov8`` maps ultralytics layer indices (model.0..model.22) onto the
tpucv module names (b0..b9 / h12..h21 / detect) — the graphs are identical by
construction (tpucv/models/yolov8.py docstring).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def t2j_conv(w: np.ndarray) -> np.ndarray:
    """torch conv OIHW -> flax HWIO (group convs keep I=in/g)."""
    return np.transpose(w, (2, 3, 1, 0))


def t2j_linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def put(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    if path[-1] in node and node[path[-1]].shape != value.shape:
        raise ValueError(
            f"shape mismatch at {'/'.join(path)}: "
            f"{node[path[-1]].shape} vs {value.shape}")
    node[path[-1]] = value


def convert_conv_bn(sd: Dict[str, np.ndarray], torch_prefix: str,
                    params: Dict, stats: Dict, flax_path: Tuple[str, ...]):
    """Map a torch Conv2d+BatchNorm2d pair (``<p>.conv`` / ``<p>.bn``) onto a
    tpucv ConvBnAct module at ``flax_path``."""
    put(params, flax_path + ("conv", "kernel"),
        t2j_conv(sd[f"{torch_prefix}.conv.weight"]))
    put(params, flax_path + ("bn", "scale"), sd[f"{torch_prefix}.bn.weight"])
    put(params, flax_path + ("bn", "bias"), sd[f"{torch_prefix}.bn.bias"])
    put(stats, flax_path + ("bn", "mean"),
        sd[f"{torch_prefix}.bn.running_mean"])
    put(stats, flax_path + ("bn", "var"), sd[f"{torch_prefix}.bn.running_var"])


# ultralytics layer index -> tpucv module name (see Yolo8.__call__)
YOLOV8_LAYER_MAP = {
    0: "b0", 1: "b1", 2: "b2", 3: "b3", 4: "b4", 5: "b5", 6: "b6", 7: "b7",
    8: "b8", 9: "b9", 12: "h12", 15: "h15", 16: "h16", 18: "h18", 19: "h19",
    21: "h21",
}


def _convert_c2f(sd, tp, params, stats, fp):
    convert_conv_bn(sd, f"{tp}.cv1", params, stats, fp + ("cv1",))
    convert_conv_bn(sd, f"{tp}.cv2", params, stats, fp + ("cv2",))
    i = 0
    while f"{tp}.m.{i}.cv1.conv.weight" in sd:
        convert_conv_bn(sd, f"{tp}.m.{i}.cv1", params, stats,
                        fp + (f"m{i}", "cv1"))
        convert_conv_bn(sd, f"{tp}.m.{i}.cv2", params, stats,
                        fp + (f"m{i}", "cv2"))
        i += 1


def import_yolov8(torch_state_dict: Dict[str, Any],
                  prefix: str = "model.") -> Dict[str, Dict]:
    """ultralytics YOLOv8-detect state_dict -> {"params", "batch_stats"}
    pytrees (plain nested dicts, merge into init variables)."""
    sd = {k: np.asarray(v) for k, v in torch_state_dict.items()}
    params: Dict = {}
    stats: Dict = {}
    for li, name in YOLOV8_LAYER_MAP.items():
        tp = f"{prefix}{li}"
        if f"{tp}.conv.weight" in sd:                     # plain Conv
            convert_conv_bn(sd, tp, params, stats, (name,))
        elif f"{tp}.cv1.conv.weight" in sd:               # C2f or SPPF
            if f"{tp}.m.0.cv1.conv.weight" in sd:
                _convert_c2f(sd, tp, params, stats, (name,))
            else:                                          # SPPF
                convert_conv_bn(sd, f"{tp}.cv1", params, stats,
                                (name, "cv1"))
                convert_conv_bn(sd, f"{tp}.cv2", params, stats,
                                (name, "cv2"))
    # Detect head (model.22): cv2/cv3 branches x 3 levels
    tp = f"{prefix}22"
    for branch in ("cv2", "cv3"):
        for lv in range(3):
            for j in range(2):
                convert_conv_bn(sd, f"{tp}.{branch}.{lv}.{j}", params, stats,
                                ("detect", f"{branch}_{lv}_{j}"))
            put(params, ("detect", f"{branch}_{lv}_2", "kernel"),
                t2j_conv(sd[f"{tp}.{branch}.{lv}.2.weight"]))
            put(params, ("detect", f"{branch}_{lv}_2", "bias"),
                sd[f"{tp}.{branch}.{lv}.2.bias"])
    if f"{tp}.dfl.conv.weight" in sd:
        put(params, ("detect", "dfl_proj"),
            sd[f"{tp}.dfl.conv.weight"].reshape(-1))
    return {"params": params, "batch_stats": stats}


def merge_into_variables(variables: Dict, imported: Dict) -> Dict:
    """Overlay imported leaves onto init variables (missing leaves keep their
    init values); returns new nested dicts."""
    import jax

    def overlay(init, imp):
        if isinstance(init, dict):
            return {k: overlay(v, imp.get(k)) if isinstance(imp, dict)
                    else v for k, v in init.items()}
        if imp is None:
            return init
        arr = np.asarray(imp, dtype=np.asarray(init).dtype)
        if arr.shape != init.shape:
            raise ValueError(f"shape mismatch {arr.shape} vs {init.shape}")
        return arr

    return {
        "params": overlay(dict(variables["params"]), imported["params"]),
        "batch_stats": overlay(dict(variables["batch_stats"]),
                               imported["batch_stats"]),
    }
