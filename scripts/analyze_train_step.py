"""Decompose the YOLOv8n training step on the real TPU (B=128, 640^2).

NOTE the fence roundtrip through the axon relay costs ~30 ms; n must be
large enough to amortise it (n=30 -> ~1 ms residual per call).

Times each piece with the pipelined-dispatch + last-scalar-fence pattern
(block_until_ready is unreliable through the axon relay):

  fwd_eval      — eval-mode forward (BN running stats)
  fwd_train     — train-mode forward (BN batch stats, mutable)
  fwd_bwd_model — model-only forward+backward (loss = sum of raw maps)
  tal_fwd       — task-aligned assigner alone on fixed raw maps
  loss_fwd      — full yolov8 loss forward on fixed raw maps
  loss_fwd_bwd  — loss forward+backward (grads wrt raw maps)
  full_step     — production make_train_step (fwd+loss+bwd+adam+EMA)

Run:  python scripts/analyze_train_step.py [--batch 128]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cost_report(tag, jitted, args):
    """Print XLA's own cost model for a jitted fn plus dual-roofline floors.

    Two floors: the v5e spec sheet (197 TF/s, 819 GB/s) and the chip's
    MEASURED effective stream bandwidth (~350 GB/s, scripts/probe_pallas_bw.py)
    — the spec floor is unreachable for bandwidth-bound programs here.
    """
    ca = jitted.lower(*args).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    f, b = ca.get("flops", float("nan")), ca.get("bytes accessed", float("nan"))
    floor_spec = max(f / 197e12, b / 819e9) * 1e3
    floor_eff = max(f / 197e12, b / 350e9) * 1e3
    print(f"  [{tag}] XLA cost: {f/1e12:.3f} TF, {b/1e9:.2f} GB"
          f" -> floor {floor_spec:.1f} ms (spec 819 GB/s)"
          f" / {floor_eff:.1f} ms (effective ~350 GB/s)", flush=True)


def timed(fn, args, n=30, fence=None):
    out = fn(*args)                    # compile + first exec
    (fence or (lambda o: float(np.asarray(o).ravel()[0])))(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    (fence or (lambda o: float(np.asarray(o).ravel()[0])))(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--scale", default="n", choices=list("nsmlx"))
    args = ap.parse_args()
    if args.batch is None:
        args.batch = {"n": 128, "s": 64, "m": 32, "l": 16, "x": 8}[args.scale]

    import jax
    import jax.numpy as jnp
    import optax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from tpucv.algorithms.base import init_on_cpu
    from tpucv.losses.yolov8 import yolov8_loss
    from tpucv.losses.tal import task_aligned_assigner
    from tpucv.ops.anchors import make_anchors
    from tpucv.train.state import TrainState, make_train_step

    import tpucv.models as _M

    B, S, M = args.batch, 640, 32
    model = getattr(_M, f"get_yolo8_{args.scale}")(dtype=jnp.bfloat16)
    print(f"scale={args.scale}", flush=True)
    variables = init_on_cpu(model, (1, S, S, 3), jnp.bfloat16)
    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.random((B, S, S, 3), dtype=np.float32)).astype(jnp.bfloat16)
    gt_labels = jax.device_put(rng.integers(0, 80, (B, M)).astype(np.int32))
    gt_bboxes = jax.device_put((rng.random((B, M, 4)) * 300).astype(np.float32))
    gt_mask = jax.device_put(np.ones((B, M), bool))
    print(f"B={B}", flush=True)

    # ---- forwards
    @jax.jit
    def fwd_eval(v, x):
        raw = model.apply(v, x)
        return sum(r.sum(dtype=jnp.float32) for r in raw)

    @jax.jit
    def fwd_train(v, x):
        raw, _ = model.apply(v, x, train=True, mutable=["batch_stats"])
        return sum(r.sum(dtype=jnp.float32) for r in raw)

    print(f"fwd_eval      {timed(fwd_eval, (variables, images)):8.2f} ms",
          flush=True)
    cost_report("fwd_eval", fwd_eval, (variables, images))
    print(f"fwd_train     {timed(fwd_train, (variables, images)):8.2f} ms",
          flush=True)

    # ---- model fwd+bwd, trivial loss
    @jax.jit
    def fwd_bwd_model(v, x):
        def f(p):
            raw, _ = model.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x,
                train=True, mutable=["batch_stats"])
            return sum(r.sum(dtype=jnp.float32) for r in raw)
        l, g = jax.value_and_grad(f)(v["params"])
        return l + sum(jnp.sum(jnp.abs(t).astype(jnp.float32))
                       for t in jax.tree_util.tree_leaves(g)) * 0

    print(f"fwd_bwd_model {timed(fwd_bwd_model, (variables, images), n=15):8.2f}"
          " ms", flush=True)
    cost_report("fwd_bwd_model", fwd_bwd_model, (variables, images))

    # ---- loss parts on fixed raw maps
    raw_fixed = jax.jit(
        lambda v, x: model.apply(v, x))(variables, images)
    raw_fixed = jax.tree_util.tree_map(jax.lax.stop_gradient, raw_fixed)
    feat_shapes = [m.shape[1:3] for m in raw_fixed]
    anc, strides = make_anchors(feat_shapes, (8, 16, 32))

    def _flat_scores_boxes(raw):
        from tpucv.nn.heads import dfl_project
        from tpucv.ops.boxes import dist2bbox
        flat = [m.reshape(B, -1, m.shape[-1]) for m in raw]
        x = jnp.concatenate(flat, axis=1)
        pd = dfl_project(x[..., :64], 16).astype(jnp.float32)
        boxes = dist2bbox(pd, anc[None])
        return jax.nn.sigmoid(x[..., 64:]), boxes

    @jax.jit
    def tal_fwd(raw, gl, gb, gm):
        scores, boxes = _flat_scores_boxes(raw)
        r = task_aligned_assigner(
            scores, boxes * strides[None], anc * strides, gl, gb, gm)
        return r.target_scores.sum(dtype=jnp.float32) + r.fg_mask.sum()

    print(f"tal_fwd       {timed(tal_fwd, (raw_fixed, gt_labels, gt_bboxes, gt_mask)):8.2f} ms",
          flush=True)

    @jax.jit
    def loss_fwd(raw, gl, gb, gm):
        l, _ = yolov8_loss(raw, gl, gb, gm, nc=80)
        return l

    print(f"loss_fwd      {timed(loss_fwd, (raw_fixed, gt_labels, gt_bboxes, gt_mask)):8.2f} ms",
          flush=True)

    @jax.jit
    def loss_fwd_bwd(raw, gl, gb, gm):
        def f(r):
            l, _ = yolov8_loss(r, gl, gb, gm, nc=80)
            return l
        l, g = jax.value_and_grad(f)(raw)
        return l + sum(jnp.sum(jnp.abs(t).astype(jnp.float32))
                       for t in jax.tree_util.tree_leaves(g)) * 0

    print(f"loss_fwd_bwd  {timed(loss_fwd_bwd, (raw_fixed, gt_labels, gt_bboxes, gt_mask)):8.2f} ms",
          flush=True)

    # ---- full production step
    def loss_fn(raw, batch):
        return yolov8_loss(raw, batch["gt_labels"], batch["gt_bboxes"],
                           batch["gt_mask"], nc=80)

    tx = optax.adam(1e-3)
    state = jax.device_put(TrainState.create(
        variables["params"], variables["batch_stats"], tx, use_ema=True))
    step = make_train_step(model.apply, loss_fn, tx, ema_decay=0.9999,
                           donate=False)
    batch = {"images": images, "gt_labels": gt_labels,
             "gt_bboxes": gt_bboxes, "gt_mask": gt_mask}

    def run_step(s, b):
        ns, m = step(s, b)
        return m["loss"]

    print(f"full_step     {timed(run_step, (state, batch), n=15):8.2f} ms",
          flush=True)
    cost_report("full_step", step, (state, batch))
    os._exit(0)


if __name__ == "__main__":
    main()
