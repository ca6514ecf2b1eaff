"""Roofline placement for every registered family on the v5e chip.

Round-4 finding (probe_yolo7_fwd.py): YOLOv7-l training is HBM-BANDWIDTH
bound — XLA reports 10.1 TF / 117 GB for fwd+bwd at B=32 (86 FLOP/byte,
under the v5e ridge of ~240), and the measured step runs at 642 GB/s =
78% of the 819 GB/s HBM peak. "26% MFU" was the wrong lens. This script
generalises the probe: for each family it lowers the eval forward and the
production train step, reads XLA's own cost_analysis (flops, bytes
accessed), times both, and prints where each program sits against the
dual roofline:

    floor_ms = max(flops / 197 TFLOP/s, bytes / 819 GB/s)

`measured/floor` close to 1.0 means the program is at the speed of light
for its byte traffic and further software tuning must REDUCE BYTES (or
raise arithmetic intensity), not re-schedule ops.

Run:  python scripts/roofline.py [yolo8_det yolo7 ssd centernet deeplabv3plus]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_TF = 197e12   # v5e bf16 MXU peak
PEAK_BW = 819e9    # v5e HBM bandwidth

# same sizing as bench.py bench_family
B_INF = {"ssd": 64, "centernet": 64, "yolo7": 32, "deeplabv3plus": 32}
B_TR = {"ssd": 64, "centernet": 32, "yolo7": 32, "deeplabv3plus": 16}


def timed(fn, args, n, fence):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / n * 1e3


def fence_fit(fn, args, ns, fence):
    """Time at several dispatch counts and least-squares fit
    measured(n) = real + K/n, eliminating the per-batch relay fence
    overhead that inflated the round-4 table (docs/performance.md
    round-5 retraction)."""
    pts = [(n, timed(fn, args, n, fence)) for n in ns]
    A = np.array([[1.0, 1.0 / n] for n, _ in pts])
    y = np.array([ms for _, ms in pts])
    real, _ = np.linalg.lstsq(A, y, rcond=None)[0]
    return float(real), pts


def cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return ca.get("flops", float("nan")), ca.get("bytes accessed",
                                                 float("nan"))


def report(tag, ms, flops, nbytes):
    floor = max(flops / PEAK_TF, nbytes / PEAK_BW) * 1e3
    bound = "HBM" if nbytes / PEAK_BW > flops / PEAK_TF else "MXU"
    print(f"{tag:28s} {ms:8.2f} ms  {flops/1e12:7.3f} TF {nbytes/1e9:7.2f} GB"
          f"  {flops/(ms*1e-3)/1e12:6.1f} TF/s {nbytes/(ms*1e-3)/1e9:5.0f} GB/s"
          f"  floor {floor:7.2f} ms ({bound})  ratio {ms/floor:4.2f}",
          flush=True)


def run_family(name):
    import jax
    import jax.numpy as jnp
    import optax

    from tpucv.builder import export_from_registry
    from tpucv.train.state import TrainState, make_train_step

    cfg, algo_cls, _ = export_from_registry(name)
    cfg.train.mixed_precision = True
    algo = algo_cls(cfg)
    model = algo.build_model()
    variables = algo.init_variables(model)
    seg = name == "deeplabv3plus"
    S = cfg.arch.crop_size if seg else cfg.dataset.input_size
    b_inf, b_tr = B_INF.get(name, 32), B_TR.get(name, 16)
    rng = np.random.default_rng(0)

    @jax.jit
    def fwd_eval(v, x):
        raw = model.apply(v, x)
        return sum(jnp.sum(r, dtype=jnp.float32)
                   for r in jax.tree_util.tree_leaves(raw))

    x = jax.device_put(rng.random(
        (b_inf, S, S, 3), dtype=np.float32)).astype(jnp.bfloat16)
    compiled = fwd_eval.lower(variables, x).compile()
    f, b = cost(compiled)
    ms, pts = fence_fit(fwd_eval, (variables, x), (20, 100, 400),
                        lambda o: float(np.asarray(o).ravel()[0]))
    report(f"{name} fwd B={b_inf}", ms, f, b)
    print(f"    raw: {'  '.join(f'n={n}:{m:.2f}' for n, m in pts)}",
          flush=True)

    loss_fn = algo.build_loss()
    tx = optax.adam(1e-3)
    bs = dict(variables).get("batch_stats")
    state = TrainState.create(variables["params"], bs, tx, use_ema=True)
    step = make_train_step(model.apply, loss_fn, tx, ema_decay=0.9999,
                           donate=False)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    if seg:
        batch = {
            "images": jax.random.uniform(k1, (b_tr, S, S, 3), jnp.bfloat16),
            "labels": jax.random.randint(
                k2, (b_tr, S, S), 0, cfg.num_classes, jnp.int32),
        }
    else:
        Mx = 32
        batch = {
            "images": jax.random.uniform(k1, (b_tr, S, S, 3), jnp.bfloat16),
            "gt_labels": jax.random.randint(
                k2, (b_tr, Mx), 0, cfg.num_classes, jnp.int32),
            "gt_bboxes": jax.random.uniform(
                k3, (b_tr, Mx, 4), jnp.float32) * (S * 0.45),
            "gt_mask": jnp.ones((b_tr, Mx), bool),
        }
    state = jax.device_put(state)
    compiled = step.lower(state, batch).compile()
    f, b = cost(compiled)
    ms, pts = fence_fit(step, (state, batch), (10, 40, 160),
                        lambda o: float(o[1]["loss"]))
    report(f"{name} train_step B={b_tr}", ms, f, b)
    print(f"    raw: {'  '.join(f'n={n}:{m:.2f}' for n, m in pts)}",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("families", nargs="*", default=[
        "yolo8_det", "yolo7", "ssd", "centernet", "deeplabv3plus"])
    args = ap.parse_args()

    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    print(f"{'program':28s} {'measured':>11s}  {'XLA flop':>9s} {'bytes':>9s}"
          f"  {'achieved':>13s}       {'roofline floor':>16s}", flush=True)
    for name in args.families:
        run_family(name)
    os._exit(0)


if __name__ == "__main__":
    main()
