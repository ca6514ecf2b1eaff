"""Micro-probe: row-gather formulations on TPU through the axon relay.

The yolov7 loss gathers (B, M*K=864, C) rows out of (B, A=25200, C); the
original take_along_axis with a fully-materialised repeated index tensor
measured ~52 ms inside the loss. Compare lowerings:

  a) take_along_axis, index repeated to (B, R, C)   [what the loss shipped]
  b) take_along_axis, broadcast index (B, R, 1)
  c) vmap'd fancy row indexing  p[i]  per image
  d) one-hot einsum contraction (B, R, A) @ (B, A, C)

Run:  python scripts/probe_gather.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, n=30):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    B, A, R, C = 32, 25200, 864, 85
    rng = np.random.default_rng(0)
    src = jax.device_put(rng.standard_normal((B, A, C)).astype(np.float32))
    idx = jax.device_put(rng.integers(0, A, (B, R)).astype(np.int32))

    @jax.jit
    def a_repeat(src, idx):
        out = jnp.take_along_axis(
            src, idx[..., None].repeat(C, -1), axis=1)
        return out.sum(dtype=jnp.float32)

    @jax.jit
    def b_broadcast(src, idx):
        out = jnp.take_along_axis(src, idx[..., None], axis=1)
        return out.sum(dtype=jnp.float32)

    @jax.jit
    def c_vmap(src, idx):
        out = jax.vmap(lambda s, i: s[i])(src, idx)
        return out.sum(dtype=jnp.float32)

    @jax.jit
    def d_onehot(src, idx):
        oh = jax.nn.one_hot(idx, A, dtype=jnp.bfloat16)
        out = jnp.einsum("bra,bac->brc", oh, src.astype(jnp.bfloat16))
        return out.sum(dtype=jnp.float32)

    for name, fn in [("a repeat-idx ", a_repeat), ("b broadcast  ", b_broadcast),
                     ("c vmap-fancy ", c_vmap), ("d onehot-mxu ", d_onehot)]:
        print(f"{name} {timed(fn, (src, idx)):8.2f} ms", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
