"""Model converter CLI (reference ``convert_model.py:9-68``): extract plain
inference weights from a tpucv training checkpoint, or import an
ultralytics/torch ``.pt``/``.pth`` state_dict into tpucv variables."""

import argparse
import os

import numpy as np


def extract_from_checkpoint(model_name: str, ckpt_path: str, out_path: str):
    """Training TrainState bundle -> pure {params, batch_stats} file
    (reference CheckPointModel, convert_model.py:9-44)."""
    from tpucv.builder import export_from_registry
    from tpucv.ckpt.checkpoint import CheckPoint

    cfg, algo_cls, _ = export_from_registry(model_name)
    algo = algo_cls(cfg)
    variables = algo.init_variables()
    # load_pure handles both pure-variables files and full TrainState
    # bundles WITHOUT needing the training optimizer structure (the bundle's
    # opt_state layout depends on weight-decay/schedule config and must not
    # be reconstructed here)
    pure = CheckPoint.load_pure(ckpt_path, {
        "params": dict(variables["params"]),
        "batch_stats": dict(variables.get("batch_stats", {}))})
    CheckPoint.save_pure(
        {"params": pure["params"], "batch_stats": pure["batch_stats"]},
        out_path)
    print(f"wrote {out_path}")


def extract_weights_from_torch_model(model_name: str, pt_path: str,
                                     out_path: str):
    """torch .pt/.pth -> tpucv variables via the weight importer
    (reference extract_weights_from_ultralytics_model, convert_model.py:46-68).
    """
    import torch
    from tpucv.builder import export_from_registry
    from tpucv.ckpt.checkpoint import CheckPoint
    from tpucv.ckpt.importer import (
        import_yolov7, import_yolov8, merge_into_variables)

    obj = torch.load(pt_path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        sd = obj.state_dict()
    elif isinstance(obj, dict) and "model" in obj and hasattr(
            obj["model"], "state_dict"):
        sd = obj["model"].float().state_dict()
    elif isinstance(obj, dict):
        sd = obj.get("state_dict", obj)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}

    cfg, algo_cls, _ = export_from_registry(model_name)
    algo = algo_cls(cfg)
    variables = algo.init_variables()
    importers = {"yolo8_det": import_yolov8, "yolo7": import_yolov7}
    if model_name not in importers:
        raise NotImplementedError(
            f"torch import supports {sorted(importers)}; other families "
            "load tpucv checkpoints directly")
    imported = importers[model_name](sd)
    merged = merge_into_variables(
        {"params": dict(variables["params"]),
         "batch_stats": dict(variables["batch_stats"])}, imported)
    CheckPoint.save_pure(merged, out_path)
    print(f"wrote {out_path}")


def quantize_checkpoint(model_name: str, weights_path: str, out_path: str,
                        calib_dir: str = ""):
    """Pure-weights file -> int8 deploy bundle: calibrate once (images from
    ``calib_dir`` if given, else the synthetic detection set) and save the
    variables WITH the 'quant' collection. predict/evaluate load it like
    any checkpoint and take the int8 path automatically (tpucv/quant.py)."""
    from tpucv import quant
    from tpucv.builder import export_from_registry
    from tpucv.ckpt.checkpoint import CheckPoint

    cfg, algo_cls, _ = export_from_registry(model_name)
    algo = algo_cls(cfg)
    if not hasattr(algo, "quantize_variables"):
        raise SystemExit(f"--int8 is not supported for {model_name}")
    variables = algo.init_variables()
    variables = CheckPoint.load_pure(weights_path, dict(variables))
    if calib_dir:
        import glob
        paths = sorted(
            p for p in glob.glob(os.path.join(calib_dir, "*"))
            if p.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")))
        if not paths:
            raise SystemExit(f"no images found in {calib_dir!r}")
        index = [(p,) for p in paths]
    else:
        from tpucv.data.detection_dataset import SyntheticDetectionIndex
        print("no --calib-dir given — calibrating on synthetic data")
        index = SyntheticDetectionIndex(
            16, cfg.dataset.input_size, cfg.num_classes, max_objects=3,
            seed=7)
    qv = algo.quantize_variables(variables, index,
                                 n_images=min(32, len(index)))
    n = quant.count_quantized(qv["quant"])
    CheckPoint.save_pure(qv, out_path)
    print(f"wrote {out_path} ({n} convs int8)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--src", required=True, help="input .ckpt or torch .pt")
    ap.add_argument("--dst", required=True, help="output weights file")
    ap.add_argument("--int8", action="store_true",
                    help="also fold+quantize: write an int8 deploy bundle "
                         "(calibrated on --calib-dir images or synthetic "
                         "data)")
    ap.add_argument("--calib-dir", default="",
                    help="directory of calibration images for --int8")
    args = ap.parse_args()
    if args.src.endswith((".pt", ".pth")):
        extract_weights_from_torch_model(args.model, args.src, args.dst)
    else:
        extract_from_checkpoint(args.model, args.src, args.dst)
    if args.int8:
        quantize_checkpoint(args.model, args.dst, args.dst, args.calib_dir)


if __name__ == "__main__":
    main()
