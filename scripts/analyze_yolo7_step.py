"""Decompose the YOLOv7-l training step on the real TPU (VERDICT r3 #3:
197.7 ms @ B=32 is 26% MFU despite 128-1024-channel convs; find where it
goes). Same pipelined-dispatch + last-scalar-fence recipe as
analyze_train_step.py (the yolov8 twin).

  fwd_eval      — eval-mode forward
  fwd_train     — train-mode forward (BN batch stats)
  fwd_bwd_model — model fwd+bwd with a trivial sum loss
  loss_fwd      — full yolov7 OTA loss forward on fixed raw maps
  loss_fwd_bwd  — loss fwd+bwd (grads wrt raw maps)
  full_step     — production make_train_step

Run:  python scripts/analyze_yolo7_step.py [--batch 32]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, n=20, fence=None):
    out = fn(*args)
    (fence or (lambda o: float(np.asarray(o).ravel()[0])))(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    (fence or (lambda o: float(np.asarray(o).ravel()[0])))(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from tpucv.algorithms.base import init_on_cpu
    from tpucv.configs.model_cfgs import Yolo7Config
    from tpucv.losses.yolov7 import yolov7_loss
    from tpucv.models.yolov7 import Yolo7
    from tpucv.train.state import TrainState, make_train_step

    cfg = Yolo7Config()
    anchors = np.asarray(cfg.arch.anchors, np.float32).reshape(3, 3, 2)
    strides = cfg.arch.strides
    nc = 80
    B, S, M = args.batch, 640, 32
    model = Yolo7(nc=nc, dtype=jnp.bfloat16)
    variables = init_on_cpu(model, (1, S, S, 3), jnp.bfloat16)
    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.random((B, S, S, 3), dtype=np.float32)).astype(jnp.bfloat16)
    gt_labels = jax.device_put(rng.integers(0, nc, (B, M)).astype(np.int32))
    gt_bboxes = jax.device_put((rng.random((B, M, 4)) * 300).astype(np.float32))
    gt_mask = jax.device_put(np.ones((B, M), bool))
    print(f"B={B}", flush=True)

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
    print(f"fwd_train     {timed(fwd_train, (variables, images)):8.2f} ms",
          flush=True)

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

    raw_fixed = jax.jit(lambda v, x: model.apply(v, x))(variables, images)
    raw_fixed = jax.tree_util.tree_map(jax.lax.stop_gradient, raw_fixed)

    def _loss(raw, gl, gb, gm):
        box_g, obj_g, cls_g = cfg.loss_gains()
        return yolov7_loss(
            raw, gb, gl, gm, anchors=anchors, strides=strides, nc=nc,
            box_gain=box_g, obj_gain=obj_g, cls_gain=cls_g,
            layer_balance=cfg.loss.layer_balance)

    @jax.jit
    def loss_fwd(raw, gl, gb, gm):
        l, _ = _loss(raw, gl, gb, gm)
        return l

    print(f"loss_fwd      {timed(loss_fwd, (raw_fixed, gt_labels, gt_bboxes, gt_mask)):8.2f} ms",
          flush=True)

    @jax.jit
    def loss_fwd_bwd(raw, gl, gb, gm):
        def f(r):
            l, _ = _loss(r, gl, gb, gm)
            return l
        l, g = jax.value_and_grad(f)(raw)
        return l + sum(jnp.sum(jnp.abs(t).astype(jnp.float32))
                       for t in jax.tree_util.tree_leaves(g)) * 0

    print(f"loss_fwd_bwd  {timed(loss_fwd_bwd, (raw_fixed, gt_labels, gt_bboxes, gt_mask)):8.2f} ms",
          flush=True)

    def loss_fn(raw, batch):
        return _loss(raw, batch["gt_labels"], batch["gt_bboxes"],
                     batch["gt_mask"])

    tx = optax.adam(1e-3)
    state = TrainState.create(
        variables["params"], variables["batch_stats"], tx, use_ema=True)
    step = make_train_step(model.apply, loss_fn, tx, ema_decay=0.9999,
                           donate=False)
    batch = {"images": images, "gt_labels": gt_labels,
             "gt_bboxes": gt_bboxes, "gt_mask": gt_mask}
    state = jax.device_put(state)

    def run(state, batch):
        s2, m = step(state, batch)
        return m["loss"]

    print(f"full_step     {timed(run, (state, batch), n=15):8.2f} ms",
          flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
