"""What bandwidth does a trivial Pallas pipeline achieve on this chip?

The conv kernel probes bottom out at ~4.3 ms for 0.4-1.7 GB of traffic
(160-390 GB/s) regardless of DMA amplification — far under the 819 GB/s
HBM peak. This times identity copies through pallas_call at different
block shapes vs the XLA copy of the same array (419 MB bf16).

Run: python scripts/probe_pallas_bw.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, n=20):
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    TOT = 1_638_400           # rows of 128 lanes = 419 MB bf16
    gb = TOT * 128 * 2 / 1e9

    x = jax.random.normal(jax.random.PRNGKey(0), (TOT, 128), jnp.bfloat16)
    jax.block_until_ready(x)

    def xla_copy(a):
        return jnp.sum(a + 1, dtype=jnp.float32)

    ms = timed(jax.jit(xla_copy), (x,))
    print(f"xla add1 (r+w {2*gb:.2f} GB)      {ms:8.3f} ms "
          f"{2*gb/(ms*1e-3):6.0f} GB/s", flush=True)

    def ident_kernel(in_ref, out_ref):
        out_ref[:] = in_ref[:] + 1

    for rows, cols, bh in [(TOT, 128, 1280), (TOT, 128, 3200),
                           (TOT, 128, 10240),
                           (TOT // 16, 2048, 400), (TOT // 16, 2048, 1600),
                           (TOT // 64, 8192, 400)]:
        xx = x.reshape(rows, cols)
        fn = pl.pallas_call(
            ident_kernel,
            grid=(rows // bh,),
            in_specs=[pl.BlockSpec((bh, cols), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bh, cols), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.bfloat16),
        )
        run = jax.jit(lambda a, _f=fn: jnp.sum(_f(a), dtype=jnp.float32))
        try:
            ms = timed(run, (xx,))
            print(f"pallas ident ({rows}x{cols} bh={bh:6d}) {ms:8.3f} ms "
                  f"{2*gb/(ms*1e-3):6.0f} GB/s", flush=True)
        except Exception as e:  # noqa: BLE001
            s = str(e)
            j = s.find("Mosaic failed")
            print(f"pallas ident bh={bh} FAIL "
                  f"{s[j:j+150] if j >= 0 else s[:150]}", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
