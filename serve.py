"""Serve CLI — batched inference HTTP server for any registered detector.

``python serve.py --model yolo8_det --ckpt saves/..._final.ckpt --port 8080``

Completes the deploy surface the reference only stubs (its
``core/deploy/onnx.py`` / ``core/deploy/tensorrt.py`` are empty files —
SURVEY §1.11): a static-shape micro-batching server in which every
request rides the same pre-compiled letterbox+forward+decode+NMS program
the eval harness and bench.py run (see tpucv/serving.py for the design).

  POST /predict  (body = JPEG/PNG bytes) -> detections JSON
  GET  /healthz  -> model/config
  GET  /stats    -> throughput/latency counters

``--int8`` serves the TRT-style PTQ variant (tpucv/quant.py), calibrated
once at startup on ``--calib`` images.
"""

import argparse
import glob
import os

from tpucv.builder import export_from_registry
from tpucv.ckpt.checkpoint import CheckPoint
from tpucv.serving import make_server


def _calib_index(pattern: str, n: int = 32):
    paths = sorted(
        glob.glob(os.path.join(pattern, "*")) if os.path.isdir(pattern)
        else glob.glob(pattern))[:n]
    if not paths:
        raise SystemExit(f"--calib matched no images: {pattern}")
    return [(p,) for p in paths]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--ckpt", type=str, default="")
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--batch", type=int, default=8,
                        help="static device batch; requests are "
                             "micro-batched up to this size")
    parser.add_argument("--max-wait-ms", type=float, default=10.0,
                        help="max time the batcher waits to fill a batch")
    parser.add_argument("--conf", type=float, default=None,
                        help="confidence threshold (default: model config)")
    parser.add_argument("--request-timeout-s", type=float, default=60.0,
                        help="per-request inference timeout (503 after)")
    parser.add_argument("--max-queue", type=int, default=None,
                        help="queue depth beyond which requests fast-fail "
                             "503 (default: 8x batch)")
    parser.add_argument("--int8", action="store_true",
                        help="serve the int8 PTQ variant (needs --calib)")
    parser.add_argument("--calib", type=str, default="",
                        help="calibration images for --int8: a directory "
                             "or a glob")
    args = parser.parse_args()

    cfg, algo_cls, _ = export_from_registry(args.model)
    algo = algo_cls(cfg)
    model = algo.build_model()
    variables = algo.init_variables(model)
    if args.ckpt:
        variables = CheckPoint.load_pure(args.ckpt, dict(variables))
    if args.int8:
        if not hasattr(algo, "quantize_variables"):
            raise SystemExit(f"--int8 is not supported for {args.model}")
        if not args.calib:
            raise SystemExit("--int8 needs --calib images")
        variables = algo.quantize_variables(
            variables, _calib_index(args.calib))

    conf = args.conf if args.conf is not None \
        else getattr(cfg.decode, "conf_threshold", 0.25)
    print(f"compiling {args.model} serving program "
          f"(batch={args.batch}, input={algo.input_size})...", flush=True)
    server = make_server(algo, variables, host=args.host, port=args.port,
                         batch_size=args.batch,
                         max_wait_ms=args.max_wait_ms, conf_threshold=conf,
                         model_name=args.model,
                         request_timeout_s=args.request_timeout_s,
                         max_queue=args.max_queue)
    print(f"serving {args.model} on http://{args.host}:{args.port} "
          f"(POST /predict, GET /healthz, GET /stats)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.batcher.stop()
        server.server_close()


if __name__ == "__main__":
    main()
