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


# reference yolov7_model.py module name -> tpucv Yolo7 module name
YOLOV7_MODULE_MAP = {
    "backbone.stem.0": "stem0", "backbone.stem.1": "stem1",
    "backbone.stem.2": "stem2", "backbone.dark2.0": "stem3",
    "backbone.dark2.1": "elan1", "backbone.dark3.0": "mp1",
    "backbone.dark3.1": "elan2", "backbone.dark4.0": "mp2",
    "backbone.dark4.1": "elan3", "backbone.dark5.0": "mp3",
    "backbone.dark5.1": "elan4",
    "conv_for_P5": "up1_conv", "conv_for_feat2": "p4_lat",
    "conv3_for_upsample1": "helan1",
    "conv_for_P4": "up2_conv", "conv_for_feat1": "p3_lat",
    "conv3_for_upsample2": "helan2",
    "down_sample1": "down1", "conv3_for_downsample1": "helan3",
    "down_sample2": "down2", "conv3_for_downsample2": "helan4",
}


def _convert_mcb(sd, tp, params, stats, fp):
    """Multi_Concat_Block: cv1, cv2, cv3.{i} list, cv4."""
    convert_conv_bn(sd, f"{tp}.cv1", params, stats, fp + ("cv1",))
    convert_conv_bn(sd, f"{tp}.cv2", params, stats, fp + ("cv2",))
    i = 0
    while f"{tp}.cv3.{i}.conv.weight" in sd:
        convert_conv_bn(sd, f"{tp}.cv3.{i}", params, stats,
                        fp + (f"cv3_{i}",))
        i += 1
    convert_conv_bn(sd, f"{tp}.cv4", params, stats, fp + ("cv4",))


def import_yolov7(torch_state_dict: Dict[str, Any]) -> Dict[str, Dict]:
    """Reference Yolo7 state_dict -> tpucv {"params", "batch_stats"} pytrees
    (module map verified by exact total-param parity, 37,297,025 at nc=20)."""
    sd = {k: np.asarray(v) for k, v in torch_state_dict.items()}
    params: Dict = {}
    stats: Dict = {}
    for tname, jname in YOLOV7_MODULE_MAP.items():
        if f"{tname}.conv.weight" in sd:                 # plain ConvBNSiLU
            convert_conv_bn(sd, tname, params, stats, (jname,))
        elif f"{tname}.cv4.conv.weight" in sd:           # Multi_Concat_Block
            _convert_mcb(sd, tname, params, stats, (jname,))
        elif f"{tname}.cv3.conv.weight" in sd:           # Transition_Block
            for cv in ("cv1", "cv2", "cv3"):
                convert_conv_bn(sd, f"{tname}.{cv}", params, stats,
                                (jname, cv))
        else:
            raise KeyError(f"unrecognised reference module {tname}")
    for cv in ("cv1", "cv2", "cv3", "cv4", "cv5", "cv6", "cv7"):
        convert_conv_bn(sd, f"sppcspc.{cv}", params, stats, ("sppcspc", cv))
    for i in range(3):
        tp = f"rep_conv_{i + 1}"
        jp = f"rep{i}"
        put(params, (jp, "dense_conv", "kernel"),
            t2j_conv(sd[f"{tp}.rbr_dense.0.weight"]))
        for flax_n, torch_n in (("scale", "weight"), ("bias", "bias")):
            put(params, (jp, "dense_bn", flax_n),
                sd[f"{tp}.rbr_dense.1.{torch_n}"])
            put(params, (jp, "one_bn", flax_n),
                sd[f"{tp}.rbr_1x1.1.{torch_n}"])
        for flax_n, torch_n in (("mean", "running_mean"), ("var", "running_var")):
            put(stats, (jp, "dense_bn", flax_n),
                sd[f"{tp}.rbr_dense.1.{torch_n}"])
            put(stats, (jp, "one_bn", flax_n),
                sd[f"{tp}.rbr_1x1.1.{torch_n}"])
        put(params, (jp, "one_conv", "kernel"),
            t2j_conv(sd[f"{tp}.rbr_1x1.0.weight"]))
        put(params, (f"head{i}", "kernel"),
            t2j_conv(sd[f"yolo_head_P{i + 3}.weight"]))
        put(params, (f"head{i}", "bias"), sd[f"yolo_head_P{i + 3}.bias"])
    return {"params": params, "batch_stats": stats}


def import_ssd(torch_state_dict: Dict[str, Any]) -> Dict[str, Dict]:
    """Reference SSD state_dict -> tpucv pytrees (tpucv/models/ssd.py is
    structurally exact: VGG-BN bias convs, BN-less conv6/7, plain extras)."""
    sd = {k: np.asarray(v) for k, v in torch_state_dict.items()}
    params: Dict = {}
    stats: Dict = {}

    # backbone.layers.N — scan conv/bn pairs in ascending layer index
    idxs = sorted({int(k.split(".")[2]) for k in sd
                   if k.startswith("backbone.layers.")})
    conv_seen = 0
    for i in idxs:
        w = sd.get(f"backbone.layers.{i}.weight")
        if w is None:
            continue
        if w.ndim == 4:                                 # conv layer
            if conv_seen < 13:                           # VGG blocks
                name = f"vgg{conv_seen}_conv"
            elif conv_seen == 13:
                name = "conv6"
            else:
                name = "conv7"
            put(params, (name, "kernel"), t2j_conv(w))
            put(params, (name, "bias"), sd[f"backbone.layers.{i}.bias"])
            conv_seen += 1
        else:                                            # batchnorm layer
            bn = f"vgg{conv_seen - 1}_bn"
            put(params, (bn, "scale"), w)
            put(params, (bn, "bias"), sd[f"backbone.layers.{i}.bias"])
            put(stats, (bn, "mean"), sd[f"backbone.layers.{i}.running_mean"])
            put(stats, (bn, "var"), sd[f"backbone.layers.{i}.running_var"])

    put(params, ("l2norm", "scale"), sd["l2_norm.weight"])
    j = 1
    while f"extras.conv{j}.weight" in sd:
        put(params, (f"extra{j}", "kernel"), t2j_conv(sd[f"extras.conv{j}.weight"]))
        put(params, (f"extra{j}", "bias"), sd[f"extras.conv{j}.bias"])
        j += 1
    i = 0
    while f"locs.{i}.weight" in sd:
        put(params, (f"loc{i}", "kernel"), t2j_conv(sd[f"locs.{i}.weight"]))
        put(params, (f"loc{i}", "bias"), sd[f"locs.{i}.bias"])
        put(params, (f"conf{i}", "kernel"), t2j_conv(sd[f"confs.{i}.weight"]))
        put(params, (f"conf{i}", "bias"), sd[f"confs.{i}.bias"])
        i += 1
    return {"params": params, "batch_stats": stats}


def _convert_plain_conv_bn(sd, tp, params, stats, fp,
                           conv_key="0", bn_key="1"):
    """torch Sequential(conv, bn, relu) -> tpucv ConvBNReLU at fp."""
    put(params, fp + ("conv", "kernel"), t2j_conv(sd[f"{tp}.{conv_key}.weight"]))
    put(params, fp + ("bn", "scale"), sd[f"{tp}.{bn_key}.weight"])
    put(params, fp + ("bn", "bias"), sd[f"{tp}.{bn_key}.bias"])
    put(stats, fp + ("bn", "mean"), sd[f"{tp}.{bn_key}.running_mean"])
    put(stats, fp + ("bn", "var"), sd[f"{tp}.{bn_key}.running_var"])


def _convert_dla_block(sd, tp, params, stats, fp):
    """reference BasicBlock (conv1/bn1/conv2/bn2) -> tpucv BasicBlock."""
    put(params, fp + ("cv1", "conv", "kernel"), t2j_conv(sd[f"{tp}.conv1.weight"]))
    put(params, fp + ("cv1", "bn", "scale"), sd[f"{tp}.bn1.weight"])
    put(params, fp + ("cv1", "bn", "bias"), sd[f"{tp}.bn1.bias"])
    put(stats, fp + ("cv1", "bn", "mean"), sd[f"{tp}.bn1.running_mean"])
    put(stats, fp + ("cv1", "bn", "var"), sd[f"{tp}.bn1.running_var"])
    put(params, fp + ("cv2_conv", "kernel"), t2j_conv(sd[f"{tp}.conv2.weight"]))
    put(params, fp + ("cv2_bn", "scale"), sd[f"{tp}.bn2.weight"])
    put(params, fp + ("cv2_bn", "bias"), sd[f"{tp}.bn2.bias"])
    put(stats, fp + ("cv2_bn", "mean"), sd[f"{tp}.bn2.running_mean"])
    put(stats, fp + ("cv2_bn", "var"), sd[f"{tp}.bn2.running_var"])


def _convert_dla_tree(sd, tp, params, stats, fp):
    """reference Tree (recursive) -> tpucv Tree."""
    if f"{tp}.project.0.weight" in sd:
        put(params, fp + ("project_conv", "kernel"),
            t2j_conv(sd[f"{tp}.project.0.weight"]))
        put(params, fp + ("project_bn", "scale"), sd[f"{tp}.project.1.weight"])
        put(params, fp + ("project_bn", "bias"), sd[f"{tp}.project.1.bias"])
        put(stats, fp + ("project_bn", "mean"),
            sd[f"{tp}.project.1.running_mean"])
        put(stats, fp + ("project_bn", "var"),
            sd[f"{tp}.project.1.running_var"])
    if f"{tp}.root.conv.weight" in sd:
        put(params, fp + ("root", "conv", "kernel"),
            t2j_conv(sd[f"{tp}.root.conv.weight"]))
        put(params, fp + ("root", "bn", "scale"), sd[f"{tp}.root.bn.weight"])
        put(params, fp + ("root", "bn", "bias"), sd[f"{tp}.root.bn.bias"])
        put(stats, fp + ("root", "bn", "mean"),
            sd[f"{tp}.root.bn.running_mean"])
        put(stats, fp + ("root", "bn", "var"),
            sd[f"{tp}.root.bn.running_var"])
    for child in ("tree1", "tree2"):
        ctp = f"{tp}.{child}"
        if f"{ctp}.conv1.weight" in sd:
            _convert_dla_block(sd, ctp, params, stats, fp + (child,))
        else:
            _convert_dla_tree(sd, ctp, params, stats, fp + (child,))


def import_dla34(torch_state_dict: Dict[str, Any]) -> Dict[str, Dict]:
    """Reference DLA-34 backbone state_dict -> tpucv DLA34 pytrees."""
    sd = {k: np.asarray(v) for k, v in torch_state_dict.items()}
    params: Dict = {}
    stats: Dict = {}
    _convert_plain_conv_bn(sd, "base_layer", params, stats, ("base",))
    _convert_plain_conv_bn(sd, "level_0", params, stats, ("level0",))
    _convert_plain_conv_bn(sd, "level_1", params, stats, ("level1",))
    for i in range(2, 6):
        _convert_dla_tree(sd, f"level_{i}", params, stats, (f"level{i}",))
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


def import_centernet(torch_state_dict: Dict[str, Any]) -> Dict[str, Dict]:
    """Full reference CenterNet (core/models/centernet_model.py:310-379)
    state_dict -> tpucv CenterNet pytrees.

    Handles the DLA-34 base (via import_dla34 on the stripped prefix), the
    DLAUp/IDAUp pyramid (proj = Sequential(conv,bn), up = grouped
    ConvTranspose (C,1,k,k) -> (k,k,1,C), node = Sequential(conv,bn)) and
    the bias-carrying two-conv heads heatmap/wh/reg -> hm/wh/reg."""
    sd = {k: np.asarray(v) for k, v in torch_state_dict.items()}
    # the reference wraps DLASeg as CenterNet.backbone
    prefix = "backbone." if any(k.startswith("backbone.") for k in sd) else ""

    base_sd = {k[len(prefix) + 5:]: v for k, v in sd.items()
               if k.startswith(prefix + "base.")}
    out = import_dla34(base_sd)
    params: Dict = {"dla": out["params"]}
    stats: Dict = {"dla": out["batch_stats"]}

    # DLAUp: ida_0..ida_{n-2}, each with proj_k/up_k (k>=1 in practice;
    # proj absent when channels already match) and node_1..node_{m-1}
    dla_up = prefix + "dla_up."
    i = 0
    while f"{dla_up}ida_{i}.node_1.0.weight" in sd:
        fp = ("dla_up", f"ida_{i}")
        tp = f"{dla_up}ida_{i}"
        k = 0
        while True:
            has_proj = f"{tp}.proj_{k}.0.weight" in sd
            has_up = f"{tp}.up_{k}.weight" in sd
            has_node = f"{tp}.node_{k}.0.weight" in sd
            if not (has_proj or has_up or has_node) and k > 0:
                break
            if has_proj:
                _convert_plain_conv_bn(sd, f"{tp}.proj_{k}", params, stats,
                                       fp + (f"proj_{k}",))
            if has_up:
                w = sd[f"{tp}.up_{k}.weight"]        # (C, 1, k, k)
                put(params, fp + (f"up_{k}", "kernel"),
                    np.transpose(w, (2, 3, 1, 0)))   # -> (k, k, 1, C)
            if has_node:
                _convert_plain_conv_bn(sd, f"{tp}.node_{k}", params, stats,
                                       fp + (f"node_{k}",))
            k += 1
        i += 1

    # heads: Sequential(conv3x3 bias, ReLU, conv1x1 bias)
    for t_name, f_name in (("heatmap", "hm"), ("wh", "wh"), ("reg", "reg")):
        tp = prefix + t_name
        put(params, (f"{f_name}_0", "kernel"), t2j_conv(sd[f"{tp}.0.weight"]))
        put(params, (f"{f_name}_0", "bias"), sd[f"{tp}.0.bias"])
        put(params, (f"{f_name}_1", "kernel"), t2j_conv(sd[f"{tp}.2.weight"]))
        put(params, (f"{f_name}_1", "bias"), sd[f"{tp}.2.bias"])
    return {"params": params, "batch_stats": stats}


def _convert_named_conv_bn(sd, conv_key: str, bn_key: str,
                           params: Dict, stats: Dict, fp: Tuple[str, ...]):
    """torch conv at ``conv_key``.weight + BN at ``bn_key``.* -> tpucv
    BNConv/ConvBNReLU {conv, bn} children at ``fp``."""
    put(params, fp + ("conv", "kernel"), t2j_conv(sd[f"{conv_key}.weight"]))
    put(params, fp + ("bn", "scale"), sd[f"{bn_key}.weight"])
    put(params, fp + ("bn", "bias"), sd[f"{bn_key}.bias"])
    put(stats, fp + ("bn", "mean"), sd[f"{bn_key}.running_mean"])
    put(stats, fp + ("bn", "var"), sd[f"{bn_key}.running_var"])


def import_resnet(torch_state_dict: Dict[str, Any],
                  prefix: str = "") -> Dict[str, Dict]:
    """torchvision-style ResNet (reference core/models/resnet.py) ->
    tpucv ResNet pytrees (stem + layer{L}_{b}/{cv1,cv2,cv3,down})."""
    sd = {k: np.asarray(v) for k, v in torch_state_dict.items()}
    params: Dict = {}
    stats: Dict = {}
    _convert_named_conv_bn(sd, f"{prefix}conv1", f"{prefix}bn1",
                           params, stats, ("stem",))
    li = 1
    while f"{prefix}layer{li}.0.conv1.weight" in sd:
        b = 0
        while f"{prefix}layer{li}.{b}.conv1.weight" in sd:
            tp = f"{prefix}layer{li}.{b}"
            fp = (f"layer{li}_{b}",)
            for ci in (1, 2, 3):
                _convert_named_conv_bn(sd, f"{tp}.conv{ci}", f"{tp}.bn{ci}",
                                       params, stats, fp + (f"cv{ci}",))
            if f"{tp}.downsample.0.weight" in sd:
                _convert_named_conv_bn(
                    sd, f"{tp}.downsample.0", f"{tp}.downsample.1",
                    params, stats, fp + ("down",))
            b += 1
        li += 1
    return {"params": params, "batch_stats": stats}


def import_deeplab(torch_state_dict: Dict[str, Any]) -> Dict[str, Dict]:
    """Full reference DeeplabV3Plus (core/models/deeplabv3plus.py:122-149)
    state_dict -> tpucv DeeplabV3Plus pytrees."""
    sd = {k: np.asarray(v) for k, v in torch_state_dict.items()}
    bb = import_resnet(sd, prefix="backbone.")
    params: Dict = {"backbone": bb["params"]}
    stats: Dict = {"backbone": bb["batch_stats"]}

    c = "classifier."
    # low-level projection (DeeplabHeadV3Plus.project :88-92)
    _convert_named_conv_bn(sd, f"{c}project.0", f"{c}project.1",
                           params, stats, ("low_proj",))
    # ASPP branches: convs.0 = 1x1, convs.1..3 = atrous 3x3, convs.4 = pool
    for i in range(4):
        _convert_named_conv_bn(sd, f"{c}aspp.convs.{i}.0",
                               f"{c}aspp.convs.{i}.1",
                               params, stats, ("aspp", f"b{i}"))
    _convert_named_conv_bn(sd, f"{c}aspp.convs.4.1", f"{c}aspp.convs.4.2",
                           params, stats, ("aspp", "pool"))
    _convert_named_conv_bn(sd, f"{c}aspp.project.0", f"{c}aspp.project.1",
                           params, stats, ("aspp", "proj"))
    # decoder: classifier.classifier = [conv3x3, BN, ReLU, conv1x1]
    _convert_named_conv_bn(sd, f"{c}classifier.0", f"{c}classifier.1",
                           params, stats, ("dec1",))
    put(params, ("classifier", "kernel"),
        t2j_conv(sd[f"{c}classifier.3.weight"]))
    put(params, ("classifier", "bias"), sd[f"{c}classifier.3.bias"])
    return {"params": params, "batch_stats": stats}
