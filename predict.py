"""Predict CLI — same flags as the reference (``predict.py:23-55``):
``python predict.py --model <name> --ckpt <path> --type image|video --src ... --dst ...``
"""

import argparse
import time

from tpucv.builder import export_from_registry
from tpucv.ckpt.checkpoint import CheckPoint


def _video_calib_frames(path: str, n: int = 8):
    """First n frames of a video as an int8-calibration index (RGB)."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise SystemExit(f"cannot open video {path}")
    frames = []
    while len(frames) < n:
        ok, bgr = cap.read()
        if not ok:
            break
        frames.append((cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB),))
    cap.release()
    if not frames:
        raise SystemExit(f"no decodable frames in {path}")
    return frames


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--ckpt", type=str, default="")
    parser.add_argument("--type", type=str, default="image",
                        choices=["image", "video"])
    parser.add_argument("--src", type=str, nargs="+", default=[],
                        help="input image path(s) or video path")
    parser.add_argument("--dst", type=str, default="detect_results")
    parser.add_argument("--int8", action="store_true",
                        help="post-training int8 quantization, calibrated "
                             "on the input images (tpucv/quant.py)")
    args = parser.parse_args()

    cfg, algo_cls, _ = export_from_registry(args.model)
    algo = algo_cls(cfg)
    model = algo.build_model()
    variables = algo.init_variables(model)
    if args.ckpt:
        variables = CheckPoint.load_pure(args.ckpt, dict(variables))

    if args.type == "video":
        from scripts.detect import detect_video
        assert len(args.src) == 1, "--type video takes one --src path"
        if args.int8:
            if not hasattr(algo, "quantize_variables"):
                raise SystemExit(f"--int8 is not supported for {args.model}")
            variables = algo.quantize_variables(
                variables, _video_calib_frames(args.src[0]), n_images=8,
                batch_size=4)
        detect_video(algo, variables, args.src[0], args.dst)
        return

    if args.int8:
        if not hasattr(algo, "quantize_variables"):
            raise SystemExit(f"--int8 is not supported for {args.model}")
        if not args.src:
            raise SystemExit("--int8 needs at least one --src image "
                             "to calibrate on")
        # calibrate on the inputs themselves (an index is anything whose
        # [i][0] yields an image path or ndarray)
        calib = [(p,) for p in args.src]
        variables = algo.quantize_variables(
            variables, calib, n_images=len(calib),
            batch_size=min(8, len(calib)))

    infer_fn = algo.make_predict_infer_fn(model)
    t0 = time.time()
    for path in args.src:
        result = algo.predict(variables, path, infer_fn=infer_fn,
                              save_dir=args.dst)
        if "boxes" in result and len(result["boxes"]):
            summary = f"{len(result['boxes'])} objects"
        elif "labels" in result:        # classification: top-k names
            summary = "top: " + ", ".join(result["labels"][:3])
        elif "class_map" in result:     # segmentation
            summary = "segmentation map"
        else:
            summary = "no detections"
        print(f"{path}: {summary} -> {result.get('saved')}")
    print(f"total time: {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
