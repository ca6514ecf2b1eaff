"""Measure the int8 PTQ inference path vs bf16 on the real TPU.

Times (a) the bare forward and (b) the full e2e pipeline (letterbox +
forward + decode + NMS) for YOLOv8n at batch 128, float vs quantized, and
reports the detection-agreement rate between the two paths on synthetic
data. ``--family ssd|centernet`` times those forwards instead (their conv
stacks quantize through the same hooks). Timing recipe per
docs/performance.md: n >= 15 dispatches, fence by fetching a scalar.

Run:  python scripts/measure_int8.py [--ckpt saves/yolo8_det_coco_final.ckpt]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def fence(x):
    return float(jnp.ravel(x)[0])


def timeit(fn, *args, n=20):
    out = fn(*args)
    fence(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fence(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="saves/yolo8_det_coco_final.ckpt")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--family", default="yolo8",
                    choices=["yolo8", "ssd", "centernet"])
    args = ap.parse_args()

    if args.family != "yolo8":
        return measure_forward_only(args)

    from tpucv import quant
    from tpucv.algorithms.yolov8 import YOLOv8
    from tpucv.ckpt.checkpoint import CheckPoint
    from tpucv.configs.model_cfgs import Yolo8DetConfig
    from tpucv.data.detection_dataset import SyntheticDetectionIndex
    from tpucv.ops.preprocess import normalize_images

    print(f"backend: {jax.default_backend()}", flush=True)
    cfg = Yolo8DetConfig()
    algo = YOLOv8(cfg)
    model = algo.build_model()
    variables = algo.init_variables(model)
    if args.ckpt and os.path.isfile(args.ckpt):
        variables = CheckPoint.load_pure(args.ckpt, dict(variables))
        print(f"loaded {args.ckpt}")

    B, S = args.batch, cfg.dataset.input_size
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8))

    # calibrate on synthetic rectangles through the production path
    index = SyntheticDetectionIndex(16, S, algo.nc, max_objects=3, seed=7)
    t0 = time.time()
    qv = algo.quantize_variables(variables, index, n_images=16, batch_size=8)
    print(f"calibrated+built in {time.time()-t0:.1f}s; "
          f"{quant.count_quantized(qv['quant'])} convs int8", flush=True)

    # (a) bare forward
    @jax.jit
    def fwd(v, u8):
        x = normalize_images(u8, algo.dtype)
        return model.apply(v, x)[0]

    t_f = timeit(fwd, variables, imgs)
    t_q = timeit(fwd, qv, imgs)
    print(f"forward B={B}: bf16 {t_f:.2f} ms | int8 {t_q:.2f} ms "
          f"({t_f/t_q:.2f}x)", flush=True)

    # (b) full e2e (forward + decode + NMS), predict-style conf
    infer = algo.make_infer_fn(model)
    t_ef = timeit(infer, variables, imgs)
    t_eq = timeit(infer, qv, imgs)
    print(f"e2e B={B}: bf16 {t_ef:.2f} ms ({B/t_ef*1000:.0f} img/s) | "
          f"int8 {t_eq:.2f} ms ({B/t_eq*1000:.0f} img/s)", flush=True)

    # agreement on a structured batch (rectangles, like eval data)
    canv = np.zeros((8, S, S, 3), np.uint8)
    for j in range(8):
        x0, y0 = rng.integers(0, S // 2, 2)
        w, h = rng.integers(S // 8, S // 2, 2)
        canv[j, y0:y0 + h, x0:x0 + w] = rng.integers(64, 255, 3)
    cb = jnp.asarray(canv)
    bf, sf, cf, vf = jax.device_get(infer(variables, cb))
    bq, sq, cq, vq = jax.device_get(infer(qv, cb))
    nf, nq_ = int(vf.sum()), int(vq.sum())
    print(f"valid detections: float {nf} int8 {nq_}")
    if nf and nq_:
        d = np.abs(bf[vf][:, None, :] - bq[vq][None, :, :]).max(-1)
        matched = (d.min(1) < 4.0).mean()
        print(f"float boxes matched within 4px by an int8 box: "
              f"{matched:.2%}")


def measure_forward_only(args):
    """bf16-vs-int8 bare forward for the non-YOLO conv families."""
    from tpucv import quant

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    if args.family == "ssd":
        from tpucv.models.ssd import SSD
        model, S, B = SSD(num_classes=21, dtype=jnp.bfloat16), 300, 128
    else:
        from tpucv.models.centernet import CenterNet
        model, S, B = CenterNet(num_classes=80, dtype=jnp.bfloat16), 384, 64

    from tpucv.algorithms.base import init_on_cpu
    v = init_on_cpu(model, (1, S, S, 3), jnp.bfloat16)
    x = jnp.asarray(rng.random((B, S, S, 3), np.float32) * 2 - 1,
                    jnp.bfloat16)
    qv = quant.quantize_for_inference(model, v, [x[:8]])
    print(f"{quant.count_quantized(qv['quant'])} convs int8", flush=True)

    @jax.jit
    def fwd(vv, xx):
        out = model.apply(vv, xx)
        return out[0] if isinstance(out, (tuple, list)) else out

    t_f = timeit(fwd, v, x)
    t_q = timeit(fwd, qv, x)
    print(f"{args.family} forward B={B}@{S}: bf16 {t_f:.2f} ms | "
          f"int8 {t_q:.2f} ms ({t_f/t_q:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
