"""Per-shape conv backward efficiency probe (round-5 roadmap data).

The zoo sweep (roofline.py + analyze_outliers.py) pinned the remaining
software gap on conv BACKWARD at 64-512 channel widths: SSD's backward
runs ~82 TF/s while its forward runs 114, and YOLOv8s trains at 40 TF/s
against a 125 TF/s conv ceiling. This probe isolates the per-shape truth
for the dominant 3x3 stride-1 SAME shapes:

  fwd          — the conv itself
  dgrad        — VJP wrt the input  (transposed conv, XLA's rewrite)
  wgrad        — VJP wrt the kernel (batch-contraction conv, XLA's rewrite)
  wgrad_asconv — the same contraction written manually via dimension
                 numbers ("CHWN","IHWO","NHWC") — detects strategy-
                 selection losses vs the autodiff path
  wgrad_im2col — explicit conv_general_dilated_patches + einsum GEMM:
                 trades 9x activation bytes for a pure MXU matmul
  gemm_equiv   — a plain (B*S*S, 9Ci) x (9Ci, Co) matmul: the MXU rate
                 ceiling for this shape's contraction dims

All bf16 with f32 accumulation, dy a real input (nothing constant-folds).
Run:  python scripts/probe_conv_shapes.py
"""

import os
import sys
import time


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (tag, B, S, Cin, Cout) — 3x3 stride-1 SAME
SHAPES = [
    ("y8n 64ch 320^2", 32, 320, 64, 64),
    ("y8s 128ch 160^2", 64, 160, 128, 128),
    ("y8s 256ch 80^2", 64, 80, 256, 256),
    ("ssd conv3 256ch 75^2", 64, 75, 256, 256),
    ("ssd conv4 512ch 38^2", 64, 38, 512, 512),
    ("vgg conv2 128ch 150^2", 64, 150, 128, 128),
]


def timed(fn, args, n=30):
    # each fn returns a f32 SCALAR; float() is the fence. Through the
    # axon relay block_until_ready is unreliable and np.asarray of a big
    # output costs ~1s/100MB of D2H — a jit-internal sum + scalar pull is
    # the one pattern that measures the in-order device stream correctly
    # (same as bench.py / roofline.py).
    out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    dn = ("NHWC", "HWIO", "NHWC")

    print(f"{'shape':24s} {'prog':13s} {'ms':>8s} {'TF/s':>7s}", flush=True)
    for tag, B, S, Ci, Co in SHAPES:
        # generate on-device: host->device of GB-sized arrays is pathological
        # through the axon relay tunnel
        key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        x = jax.random.normal(k1, (B, S, S, Ci), jnp.bfloat16)
        w = jax.random.normal(k2, (3, 3, Ci, Co), jnp.bfloat16) * 0.05
        dy = jax.random.normal(k3, (B, S, S, Co), jnp.bfloat16)
        jax.block_until_ready((x, w, dy))
        tf = 2 * B * S * S * 9 * Ci * Co / 1e12

        def conv(xx, ww):
            # plain bf16, as flax nn.Conv(dtype=bf16) runs in production
            # (MXU accumulates bf16 matmuls in f32 internally regardless)
            return lax.conv_general_dilated(
                xx, ww, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)

        def s(t):
            return jnp.sum(t, dtype=jnp.float32)

        def fwd(xx, ww):
            return s(conv(xx, ww))

        def dgrad(xx, ww, gy):
            return s(jax.vjp(lambda a: conv(a, ww), xx)[1](gy)[0])

        def wgrad(xx, ww, gy):
            return s(jax.vjp(lambda a: conv(xx, a), ww)[1](gy)[0])

        def wgrad_asconv(xx, gy):
            # out[ci,kh,kw,co] = sum_{b,h,w} x[b,h+kh-1,w+kw-1,ci]*dy[b,h,w,co]
            return s(lax.conv_general_dilated(
                xx, gy, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("CHWN", "IHWO", "NHWC"),
                preferred_element_type=jnp.float32))

        def wgrad_im2col(xx, gy):
            p = lax.conv_general_dilated_patches(
                xx, (3, 3), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=dn)          # (B,S,S, Ci*9)
            return s(jnp.einsum("bhwk,bhwc->kc", p, gy,
                                preferred_element_type=jnp.float32))

        a2 = jax.random.normal(k1, (B * S * S, 9 * Ci), jnp.bfloat16)
        b2 = jax.random.normal(k2, (9 * Ci, Co), jnp.bfloat16)

        def gemm(aa, bb):
            return s(jnp.matmul(aa, bb, preferred_element_type=jnp.float32))

        def readsum(xx):
            # pure HBM read of x: calibrates the fence-sum overhead and
            # gives the measured read bandwidth reference for this shape
            return s(xx)

        runs = [
            ("readsum", jax.jit(readsum), (x,)),
            ("fwd", jax.jit(fwd), (x, w)),
            ("dgrad", jax.jit(dgrad), (x, w, dy)),
            ("wgrad", jax.jit(wgrad), (x, w, dy)),
            ("wgrad_asconv", jax.jit(wgrad_asconv), (x, dy)),
            ("wgrad_im2col", jax.jit(wgrad_im2col), (x, dy)),
            ("gemm_equiv", jax.jit(gemm), (a2, b2)),
        ]
        for name, fn, args in runs:
            try:
                ms = timed(fn, args)
                print(f"{tag:24s} {name:13s} {ms:8.3f} {tf/(ms*1e-3):7.1f}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{tag:24s} {name:13s} FAILED {type(e).__name__}: "
                      f"{str(e)[:90]}", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
