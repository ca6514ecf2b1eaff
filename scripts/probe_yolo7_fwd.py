"""Probe where the YOLOv7-l forward/backward time goes on the TPU.

Round-4 decomposition (analyze_yolo7_step.py) shows fwd_bwd_model = 181 ms
of the 192 ms step at B=32; fwd_eval alone is 62.8 ms (~53 TFLOP/s, ~27%
MFU) despite 128-1024-channel convs. Three hypotheses, one probe each:

  a) MFU math is wrong    -> XLA cost_analysis() FLOP count per forward
  b) HBM/activation pressure -> per-image time vs batch (8/16/32)
  c) backward scheduling  -> fwd+bwd with jax.checkpoint on the backbone

Run:  python scripts/probe_yolo7_fwd.py [--batch 32]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, n=15):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from tpucv.algorithms.base import init_on_cpu
    from tpucv.models.yolov7 import Yolo7

    S = 640
    model = Yolo7(nc=80, dtype=jnp.bfloat16)
    variables = init_on_cpu(model, (1, S, S, 3), jnp.bfloat16)
    rng = np.random.default_rng(0)

    # --- a) XLA's own FLOP count for one forward -------------------------
    B = args.batch
    x = jax.device_put(
        rng.random((B, S, S, 3), dtype=np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def fwd_eval(v, xx):
        raw = model.apply(v, xx)
        return sum(r.sum(dtype=jnp.float32) for r in raw)

    lowered = fwd_eval.lower(variables, x)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    ms = timed(fwd_eval, (variables, x))
    print(f"fwd_eval B={B}: {ms:7.2f} ms   XLA flops={flops/1e12:.3f} TF"
          f"   -> {flops / (ms * 1e-3) / 1e12:.1f} TFLOP/s", flush=True)
    bytes_accessed = ca.get("bytes accessed", float("nan"))
    print(f"  bytes accessed={bytes_accessed/1e9:.2f} GB"
          f"   -> {bytes_accessed / (ms * 1e-3) / 1e9:.0f} GB/s", flush=True)

    # --- b) per-image time vs batch ---------------------------------------
    for b in (8, 16, 32):
        if b == B:
            continue
        xb = jax.device_put(
            rng.random((b, S, S, 3), dtype=np.float32)).astype(jnp.bfloat16)
        ms_b = timed(fwd_eval, (variables, xb))
        print(f"fwd_eval B={b}: {ms_b:7.2f} ms   ({ms_b / b:5.2f} ms/img)",
              flush=True)
    print(f"fwd_eval B={B}: {ms:7.2f} ms   ({ms / B:5.2f} ms/img)", flush=True)

    # --- c) fwd+bwd: plain vs remat ---------------------------------------
    def make_fwd_bwd(remat):
        apply = model.apply
        if remat:
            apply = jax.checkpoint(
                apply, static_argnums=(), policy=jax.checkpoint_policies
                .dots_with_no_batch_dims_saveable)

        @jax.jit
        def fwd_bwd(v, xx):
            def f(p):
                raw, _ = model.apply(
                    {"params": p, "batch_stats": v["batch_stats"]}, xx,
                    train=True, mutable=["batch_stats"])
                return sum(r.sum(dtype=jnp.float32) for r in raw)
            if remat:
                f = jax.checkpoint(f)
            l, g = jax.value_and_grad(f)(v["params"])
            return l + sum(jnp.sum(jnp.abs(t).astype(jnp.float32))
                           for t in jax.tree_util.tree_leaves(g)) * 0
        return fwd_bwd

    plain = make_fwd_bwd(False)
    ca2 = plain.lower(variables, x).compile().cost_analysis()
    if isinstance(ca2, (list, tuple)):
        ca2 = ca2[0]
    f2 = ca2.get("flops", float("nan"))
    ms2 = timed(plain, (variables, x), n=10)
    print(f"fwd_bwd plain B={B}: {ms2:7.2f} ms   XLA flops={f2/1e12:.3f} TF"
          f"   -> {f2 / (ms2 * 1e-3) / 1e12:.1f} TFLOP/s", flush=True)
    b2 = ca2.get("bytes accessed", float("nan"))
    print(f"  bytes accessed={b2/1e9:.2f} GB"
          f"   -> {b2 / (ms2 * 1e-3) / 1e9:.0f} GB/s", flush=True)

    rem = make_fwd_bwd(True)
    ms3 = timed(rem, (variables, x), n=10)
    print(f"fwd_bwd remat B={B}: {ms3:7.2f} ms", flush=True)

    os._exit(0)


if __name__ == "__main__":
    main()
