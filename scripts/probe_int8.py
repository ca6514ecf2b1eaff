"""Probe: is the v5e int8 MXU path reachable through XLA conv/dot lowering?

v5e peak is ~197 TFLOP/s bf16 and ~394 TOPS int8.  If
``lax.conv_general_dilated`` on int8 operands with
``preferred_element_type=int32`` lowers to the int8 systolic path, a
quantized inference pass can roughly halve the 13.4 ms YOLOv8n forward.
This probe times representative YOLOv8n conv shapes and a large matmul in
bf16 vs int8 before any framework work is committed.

Timing recipe per docs/performance.md: n>=15 dispatches, fence by fetching
a scalar, report per-call ms.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial


def fence(x):
    return float(jnp.ravel(x)[0])


def timeit(fn, *args, n=20):
    fn(*args)  # compile
    fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / n * 1e3


@partial(jax.jit, static_argnums=(2,))
def conv(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if x.dtype == jnp.bfloat16
        else jnp.int32)


@jax.jit
def matmul(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32 if a.dtype == jnp.bfloat16
        else jnp.int32)


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}")

    # big matmul first: 4096^3
    N = 4096
    a8 = jnp.asarray(rng.integers(-127, 127, (N, N), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-127, 127, (N, N), dtype=np.int8))
    abf = a8.astype(jnp.bfloat16)
    bbf = b8.astype(jnp.bfloat16)
    flops = 2 * N**3
    t_bf = timeit(matmul, abf, bbf)
    t_i8 = timeit(matmul, a8, b8)
    print(f"matmul {N}^3: bf16 {t_bf:.3f} ms ({flops/t_bf/1e9:.0f} GF/s)  "
          f"int8 {t_i8:.3f} ms ({flops/t_i8/1e9:.0f} GOP/s)  "
          f"speedup {t_bf/t_i8:.2f}x")

    # representative YOLOv8n conv shapes at B=128 (H, W, Cin, Cout, k, s)
    shapes = [
        (160, 160, 32, 64, 3, 2),
        (80, 80, 64, 64, 3, 1),
        (80, 80, 64, 128, 3, 2),
        (40, 40, 128, 128, 3, 1),
        (20, 20, 256, 256, 3, 1),
        (80, 80, 64, 80, 3, 1),   # head-ish
    ]
    B = 32  # keep HBM modest; ratios are what matter
    for (H, W, ci, co, k, s) in shapes:
        x8 = jnp.asarray(rng.integers(-127, 127, (B, H, W, ci), dtype=np.int8))
        w8 = jnp.asarray(rng.integers(-127, 127, (k, k, ci, co), dtype=np.int8))
        xbf = x8.astype(jnp.bfloat16)
        wbf = w8.astype(jnp.bfloat16)
        fl = 2 * B * (H // s) * (W // s) * k * k * ci * co
        tb = timeit(conv, xbf, wbf, s)
        ti = timeit(conv, x8, w8, s)
        print(f"conv {H}x{W} {ci}->{co} k{k}s{s}: "
              f"bf16 {tb:.3f} ms ({fl/tb/1e9:.0f} GF/s)  "
              f"int8 {ti:.3f} ms ({fl/ti/1e9:.0f} GOP/s)  "
              f"speedup {tb/ti:.2f}x")


if __name__ == "__main__":
    main()
    import os
    os._exit(0)
