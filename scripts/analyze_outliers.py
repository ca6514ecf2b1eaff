"""Decompose the two roofline outliers found by scripts/roofline.py:

  ssd train_step B=64   : 140.3 ms vs 79.8 ms floor (1.76x) — where does
                          the extra 60 ms go: model bwd, or the multibox
                          loss with in-graph target assignment?
  centernet fwd B=64    : 24.9 ms vs 12.6 ms floor (1.97x), 415 GB/s —
                          which stage: DLA-34 backbone, DLAUp pyramid,
                          or the three 256-wide heads?

Same pipelined-dispatch + scalar-fence recipe as analyze_yolo7_step.py.
Run:  python scripts/analyze_outliers.py
"""

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


def cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return ca.get("flops", float("nan")), ca.get("bytes accessed", float("nan"))


def row(tag, ms, f=None, b=None):
    extra = ""
    if f is not None:
        extra = (f"  {f/1e12:6.3f} TF {b/1e9:6.2f} GB"
                 f"  {f/(ms*1e-3)/1e12:6.1f} TF/s {b/(ms*1e-3)/1e9:5.0f} GB/s")
    print(f"{tag:26s} {ms:8.2f} ms{extra}", flush=True)


def ssd_probe():
    import jax
    import jax.numpy as jnp
    import optax

    from tpucv.builder import export_from_registry
    from tpucv.train.state import TrainState, make_train_step

    cfg, algo_cls, _ = export_from_registry("ssd")
    cfg.train.mixed_precision = True
    algo = algo_cls(cfg)
    model = algo.build_model()
    variables = algo.init_variables(model)
    B, S, M = 64, cfg.arch.input_size, 32
    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.random((B, S, S, 3), dtype=np.float32)).astype(jnp.bfloat16)
    gl = jax.device_put(rng.integers(1, cfg.num_classes, (B, M)).astype(np.int32))
    gb = jax.device_put((rng.random((B, M, 4)) * S * 0.45).astype(np.float32))
    gm = jax.device_put(np.ones((B, M), bool))
    print(f"== ssd B={B} {S}x{S}", flush=True)

    @jax.jit
    def fwd_eval(v, x):
        loc, cf = model.apply(v, x)
        return loc.sum(dtype=jnp.float32) + cf.sum(dtype=jnp.float32)

    c = fwd_eval.lower(variables, images).compile()
    row("fwd_eval", timed(fwd_eval, (variables, images)), *cost(c))

    @jax.jit
    def fwd_train(v, x):
        (loc, cf), _ = model.apply(v, x, train=True, mutable=["batch_stats"])
        return loc.sum(dtype=jnp.float32) + cf.sum(dtype=jnp.float32)

    c = fwd_train.lower(variables, images).compile()
    row("fwd_train", timed(fwd_train, (variables, images)), *cost(c))

    @jax.jit
    def fwd_bwd_model(v, x):
        def f(p):
            (loc, cf), _ = model.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x,
                train=True, mutable=["batch_stats"])
            return loc.sum(dtype=jnp.float32) + cf.sum(dtype=jnp.float32)
        l, g = jax.value_and_grad(f)(v["params"])
        return l + sum(jnp.sum(jnp.abs(t).astype(jnp.float32))
                       for t in jax.tree_util.tree_leaves(g)) * 0

    c = fwd_bwd_model.lower(variables, images).compile()
    row("fwd_bwd_model", timed(fwd_bwd_model, (variables, images), n=15),
        *cost(c))

    loss_fn = algo.build_loss()
    raw = jax.jit(lambda v, x: model.apply(v, x))(variables, images)
    raw = jax.tree_util.tree_map(jax.lax.stop_gradient, raw)
    batch = {"gt_labels": gl, "gt_bboxes": gb, "gt_mask": gm}

    @jax.jit
    def loss_fwd(r, b):
        l, _ = loss_fn(r, b)
        return l

    c = loss_fwd.lower(raw, batch).compile()
    row("loss_fwd", timed(loss_fwd, (raw, batch)), *cost(c))

    @jax.jit
    def loss_fwd_bwd(r, b):
        def f(rr):
            l, _ = loss_fn(rr, b)
            return l
        l, g = jax.value_and_grad(f)(r)
        return l + sum(jnp.sum(jnp.abs(t).astype(jnp.float32))
                       for t in jax.tree_util.tree_leaves(g)) * 0

    c = loss_fwd_bwd.lower(raw, batch).compile()
    row("loss_fwd_bwd", timed(loss_fwd_bwd, (raw, batch)), *cost(c))

    tx = optax.adam(1e-3)
    bs = dict(variables).get("batch_stats")
    state = jax.device_put(
        TrainState.create(variables["params"], bs, tx, use_ema=True))
    step = make_train_step(model.apply, loss_fn, tx, ema_decay=0.9999,
                           donate=False)
    batch_full = dict(batch, images=images)
    c = step.lower(state, batch_full).compile()
    row("full_step", timed(step, (state, batch_full), n=15,
                           fence=lambda o: float(o[1]["loss"])), *cost(c))


def centernet_probe():
    import jax
    import jax.numpy as jnp

    from tpucv.algorithms.base import init_on_cpu
    from tpucv.builder import export_from_registry
    from tpucv.models.centernet import DLA34, DLA34_CHANNELS, DLAUp

    cfg, algo_cls, _ = export_from_registry("centernet")
    cfg.train.mixed_precision = True
    algo = algo_cls(cfg)
    model = algo.build_model()
    variables = algo.init_variables(model)
    B, S = 64, cfg.dataset.input_size
    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.random((B, S, S, 3), dtype=np.float32)).astype(jnp.bfloat16)
    print(f"== centernet B={B} {S}x{S}", flush=True)

    @jax.jit
    def fwd_full(v, x):
        return model.apply(v, x).sum(dtype=jnp.float32)

    c = fwd_full.lower(variables, images).compile()
    row("fwd_full", timed(fwd_full, (variables, images)), *cost(c))

    dla = DLA34(dtype=jnp.bfloat16)
    dv = init_on_cpu(dla, (1, S, S, 3), jnp.bfloat16)

    @jax.jit
    def fwd_dla(v, x):
        return sum(f.sum(dtype=jnp.float32) for f in dla.apply(v, x))

    c = fwd_dla.lower(dv, images).compile()
    row("fwd_dla34", timed(fwd_dla, (dv, images)), *cost(c))

    feats = jax.jit(lambda v, x: dla.apply(v, x))(dv, images)
    feats = [jax.lax.stop_gradient(f) for f in feats[2:]]
    up = DLAUp(DLA34_CHANNELS[2:], dtype=jnp.bfloat16)
    uv = up.init(jax.random.PRNGKey(0),
                 [jnp.zeros((1,) + f.shape[1:], f.dtype) for f in feats])

    @jax.jit
    def fwd_up(v, fs):
        return up.apply(v, fs).sum(dtype=jnp.float32)

    c = fwd_up.lower(uv, feats).compile()
    row("fwd_dla_up", timed(fwd_up, (uv, feats)), *cost(c))


def main():
    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("ssd", "both"):
        ssd_probe()
    if which in ("centernet", "both"):
        centernet_probe()
    os._exit(0)


if __name__ == "__main__":
    main()
