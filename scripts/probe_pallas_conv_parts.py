"""Decompose the packed Pallas conv's cost on one shape (64ch 320^2 B32).

Variants (timing only; numerics intentionally wrong for all but `full`):
  full        — the real kernel (9 shifted+masked GEMMs, prev/cur/next)
  nohalo      — same but only the body block (isolates 3x DMA amplification)
  noshift     — 9 GEMMs on the unshifted body (isolates shift+mask cost)
  gemm1       — a single GEMM on the body (MXU + pipeline floor)
  bhp=...     — full kernel at different block heights (grid overhead)
Run: python scripts/probe_pallas_conv_parts.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, S, C = 32, 320, 64


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

    G = 128 // C
    SPR = S // G
    IMG = S * SPR
    TOT = B * IMG
    tf = 2 * B * S * S * 9 * C * C / 1e12

    copies = [(du, dp) for du in range(3) for dp in (-1, 0, 1)]

    def make(BHP, mode):
        NBLK = TOT // BHP

        def kernel(prev_ref, cur_ref, nxt_ref, w_ref, out_ref):
            i = pl.program_id(0)
            if mode == "full":
                slab = jnp.concatenate(
                    [prev_ref[:], cur_ref[:], nxt_ref[:]], axis=0)
            iota = jax.lax.broadcasted_iota(jnp.int32, (BHP, 1), 0)
            r = i * BHP + iota
            h = (r % IMG) // SPR
            sp = r % SPR
            y = jnp.zeros((BHP, 128), jnp.float32)
            n_gemm = 1 if mode == "gemm1" else 9
            for a_idx in range(n_gemm):
                du, dp = copies[a_idx]
                if mode == "full":
                    sigma = (du - 1) * SPR + dp
                    piece = slab[BHP + sigma: 2 * BHP + sigma]
                elif mode == "nohalo":
                    sigma = dp  # stay inside the body block
                    piece = cur_ref[pl.ds(8 + sigma, BHP - 16)]
                    piece = jnp.pad(piece, ((8, 8), (0, 0)))
                else:  # noshift / gemm1
                    piece = cur_ref[:]
                if mode in ("full", "nohalo"):
                    keep = jnp.ones_like(r, dtype=jnp.bool_)
                    if du == 0:
                        keep = keep & (h != 0)
                    if du == 2:
                        keep = keep & (h != S - 1)
                    if dp == -1:
                        keep = keep & (sp != 0)
                    if dp == 1:
                        keep = keep & (sp != SPR - 1)
                    piece = jnp.where(keep, piece, 0)
                y = y + jnp.dot(piece, w_ref[a_idx],
                                preferred_element_type=jnp.float32)
            out_ref[:] = y.astype(out_ref.dtype)

        def clamp(v):
            return jnp.clip(v, 0, NBLK - 1)

        spec = functools.partial(pl.BlockSpec, (BHP, 128),
                                 memory_space=pltpu.VMEM)
        fn = pl.pallas_call(
            kernel,
            grid=(NBLK,),
            in_specs=[
                spec(lambda i: (clamp(i - 1), 0)),
                spec(lambda i: (i, 0)),
                spec(lambda i: (clamp(i + 1), 0)),
                pl.BlockSpec((9, 128, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BHP, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TOT, 128), jnp.bfloat16),
            cost_estimate=pl.CostEstimate(
                flops=2 * TOT * 9 * 128 * 128,
                bytes_accessed=2 * 2 * TOT * 128,
                transcendentals=0),
        )

        @jax.jit
        def run(x2, wa):
            return jnp.sum(fn(x2, x2, x2, wa), dtype=jnp.float32)

        return run

    x2 = jax.random.normal(jax.random.PRNGKey(0), (TOT, 128), jnp.bfloat16)
    wa = jax.random.normal(jax.random.PRNGKey(1), (9, 128, 128),
                           jnp.bfloat16) * 0.05
    jax.block_until_ready((x2, wa))

    cases = [
        ("full bhp=1280", 1280, "full"),
        ("full bhp=2560", 2560, "full"),
        ("full bhp=5120", 5120, "full"),
        ("full bhp=640", 640, "full"),
        ("nohalo bhp=1280", 1280, "nohalo"),
        ("noshift bhp=1280", 1280, "noshift"),
        ("gemm1 bhp=1280", 1280, "gemm1"),
        ("noshift bhp=5120", 5120, "noshift"),
    ]
    for name, bhp, mode in cases:
        try:
            run = make(bhp, mode)
            ms = timed(run, (x2, wa))
            eff = tf / (ms * 1e-3)
            print(f"{name:18s} {ms:8.3f} ms  {eff:6.1f} TF/s(conv-true)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            s = str(e)
            i = s.find("Mosaic failed")
            print(f"{name:18s} FAIL {s[i:i+200] if i >= 0 else s[:200]}",
                  flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
