"""Probe the YOLOv8n conv-backward gap (56 ms measured vs 35 ms modeled).

Splits the model backward into dgrad (grads wrt activations only) and
wgrad (grads wrt params only) and times each on the real TPU, optionally
under alternative XLA flag sets (pass via env before launch). The split
tells us where XLA's conv backward loses MXU efficiency at YOLOv8n's
16-256 channel widths.

  python scripts/probe_conv_bwd.py [--batch 128]
  XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=65536" python scripts/probe_conv_bwd.py
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, n=30):
    out = fn(*args)
    float(np.asarray(jax_leaf(out)).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(np.asarray(jax_leaf(out)).ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def jax_leaf(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from tpucv.algorithms.base import init_on_cpu
    from tpucv.models import get_yolo8_n

    model = get_yolo8_n(dtype=jnp.bfloat16)
    variables = init_on_cpu(model, (1, 640, 640, 3), jnp.bfloat16)
    params, bstats = variables["params"], variables.get("batch_stats", {})
    B = args.batch
    x = jnp.zeros((B, 640, 640, 3), jnp.bfloat16)

    def fwd_scalar(p, xx):
        out = model.apply({"params": p, "batch_stats": bstats}, xx,
                          train=False)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in
                   jax.tree_util.tree_leaves(out))

    g_w = jax.jit(jax.grad(fwd_scalar, argnums=0))      # wgrad chain
    g_x = jax.jit(jax.grad(fwd_scalar, argnums=1))      # dgrad chain
    f_only = jax.jit(fwd_scalar)

    print(f"flags: {os.environ.get('XLA_FLAGS', '<none>')}", flush=True)
    t_f = timed(lambda p: f_only(p, x), (params,))
    print(f"forward (eval mode)      : {t_f:7.2f} ms", flush=True)
    t_w = timed(lambda p: g_w(p, x), (params,))
    print(f"fwd + wgrad-only backward: {t_w:7.2f} ms  (bwd {t_w - t_f:.2f})",
          flush=True)
    t_x = timed(lambda p: g_x(p, x), (params,))
    print(f"fwd + dgrad-only backward: {t_x:7.2f} ms  (bwd {t_x - t_f:.2f})",
          flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
