"""v2 decomposition of the packed Pallas conv (64ch 320^2 B32).

v1 found: GEMMs ~free, pipeline floor ~4.3 ms (3x halo DMA), shifts+masks
~4.1 ms. This isolates masks vs shifts and tests the restructured kernel:

  fullnomask  — slab + 9 shifted GEMMs, NO masks (boundary-wrong numerics;
                isolates the where() cost)
  slab2       — correct kernel: dp=+-1 masks pre-folded into two shifted
                slab copies, du image-boundary handling via a zero-block
                select on prev/next, 9 ALIGNED slice GEMMs
  slab2nomask — slab2 without the premask/zero-select (shift cost only)

Run: python scripts/probe_pallas_conv_v2.py
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
    from jax import lax
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

    def make_roll(BHP):
        """1x-DMA variant: lag-one compute with a rolling 2-slot scratch.

        At grid step i the only HBM fetch is block i; blocks i-1 and i-2
        live in VMEM scratch (written on previous steps). The kernel
        computes OUTPUT block i-1 (which needs i-2 tail, i-1, i head) and
        then saves block i into the rolling scratch. Grid runs NBLK+1
        steps; step 0 only seeds the scratch.
        """
        from jax.experimental import pallas as pl2  # local alias
        NBLK = TOT // BHP
        BPI = IMG // BHP
        assert IMG % BHP == 0

        def kernel(cur_ref, w_ref, out_ref, scr):
            i = pl.program_id(0)
            o = i - 1                     # output block index
            zero = jnp.zeros((1, 1), cur_ref.dtype)

            @pl.when(i > 0)
            def _compute():
                pm1 = scr[(i - 1) % 2]    # block o
                pm2 = jnp.where((o % BPI) == 0, zero, scr[i % 2])
                nxt = jnp.where((o % BPI) == BPI - 1, zero, cur_ref[:])
                slab = jnp.concatenate([pm2, pm1, nxt], axis=0)
                iota = jax.lax.broadcasted_iota(jnp.int32, (3 * BHP, 1), 0)
                sp = (o * BHP + iota - BHP) % SPR
                lo = BHP - SPR - 1
                hi = 2 * BHP + SPR + 1
                sm = jnp.where(sp[lo + 1: hi - 1] != 0,
                               slab[lo: hi - 2], 0)
                spl = jnp.where(sp[lo + 1: hi - 1] != SPR - 1,
                                slab[lo + 2: hi], 0)

                def piece(du, dp):
                    base = BHP + (du - 1) * SPR
                    if dp == 0:
                        return slab[base: base + BHP]
                    src = sm if dp == -1 else spl
                    off = base - (lo + 1)
                    return src[off: off + BHP]

                y = jnp.zeros((BHP, 128), jnp.float32)
                for a_idx, (du, dp) in enumerate(copies):
                    y = y + jnp.dot(piece(du, dp), w_ref[a_idx],
                                    preferred_element_type=jnp.float32)
                out_ref[:] = y.astype(out_ref.dtype)

            scr[i % 2] = cur_ref[:]       # save block i for later steps

        def cin(v):
            return jnp.clip(v, 0, NBLK - 1)

        fn = pl.pallas_call(
            kernel,
            grid=(NBLK + 1,),
            in_specs=[
                pl.BlockSpec((BHP, 128), lambda i: (cin(i), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9, 128, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BHP, 128),
                                   lambda i: (cin(i - 1), 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TOT, 128), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((2, BHP, 128), jnp.bfloat16)],
            cost_estimate=pl.CostEstimate(
                flops=2 * TOT * 9 * 128 * 128,
                bytes_accessed=2 * 2 * TOT * 128,
                transcendentals=0),
        )
        return fn

    def make(BHP, mode):
        NBLK = TOT // BHP
        BPI = IMG // BHP     # blocks per image (integer by construction)
        assert IMG % BHP == 0

        def kernel(prev_ref, cur_ref, nxt_ref, w_ref, out_ref):
            i = pl.program_id(0)
            masked = mode in ("full", "fullnomask")
            premask = mode == "slab2"
            if mode == "fullnomask" or masked and False:
                pass
            if premask:
                # zero out prev/next when they belong to another image
                zero = jnp.zeros((1, 1), cur_ref.dtype)
                prev = jnp.where((i % BPI) == 0, zero, prev_ref[:])
                nxt = jnp.where((i % BPI) == BPI - 1, zero, nxt_ref[:])
            else:
                prev = prev_ref[:]
                nxt = nxt_ref[:]
            slab = jnp.concatenate([prev, cur_ref[:], nxt], axis=0)
            iota = jax.lax.broadcasted_iota(jnp.int32, (3 * BHP, 1), 0)
            sp = (i * BHP + iota - BHP) % SPR
            y = jnp.zeros((BHP, 128), jnp.float32)
            if mode in ("slab2", "slab2nomask"):
                # two shifted slabs over the needed range, dp-premasked
                lo = BHP - SPR - 1
                hi = 2 * BHP + SPR + 1
                sm = slab[lo: hi - 2]          # rows t-1 for t in [lo+1,hi-1)
                sps = sp[lo + 1: hi - 1]
                if premask:
                    sm = jnp.where(sps != 0, sm, 0)
                sps2 = sp[lo + 1: hi - 1]
                spl = slab[lo + 2: hi]          # rows t+1
                if premask:
                    spl = jnp.where(sps2 != SPR - 1, spl, 0)
                # slabs indexed by t - (lo+1)
                def piece(du, dp):
                    base = BHP + (du - 1) * SPR
                    if dp == 0:
                        return slab[base: base + BHP]
                    src = sm if dp == -1 else spl
                    off = base - (lo + 1)
                    return src[off: off + BHP]
                for a_idx, (du, dp) in enumerate(copies):
                    y = y + jnp.dot(piece(du, dp), w_ref[a_idx],
                                    preferred_element_type=jnp.float32)
            else:  # full / fullnomask
                r = i * BHP + jax.lax.broadcasted_iota(
                    jnp.int32, (BHP, 1), 0)
                h = (r % IMG) // SPR
                spb = r % SPR
                for a_idx, (du, dp) in enumerate(copies):
                    sigma = (du - 1) * SPR + dp
                    p = slab[BHP + sigma: 2 * BHP + sigma]
                    if mode == "full":
                        keep = jnp.ones_like(r, dtype=jnp.bool_)
                        if du == 0:
                            keep = keep & (h != 0)
                        if du == 2:
                            keep = keep & (h != S - 1)
                        if dp == -1:
                            keep = keep & (spb != 0)
                        if dp == 1:
                            keep = keep & (spb != SPR - 1)
                        p = jnp.where(keep, p, 0)
                    y = y + jnp.dot(p, w_ref[a_idx],
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
        return fn

    def pack_weights(w):
        wa = jnp.zeros((9, 128, 128), w.dtype)
        for a_idx, (du, dp) in enumerate(copies):
            for kp in range(G):
                for j in range(G):
                    dv = G * dp + kp - j + 1
                    if 0 <= dv <= 2:
                        wa = wa.at[a_idx, kp * C:(kp + 1) * C,
                                   j * C:(j + 1) * C].set(w[du, dv])
        return wa

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (B, S, S, C), jnp.bfloat16)
    w = jax.random.normal(k2, (3, 3, C, C), jnp.bfloat16) * 0.1
    x2 = x.reshape(TOT, 128)
    wa = pack_weights(w)
    ref = lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9
    jax.block_until_ready((x2, wa, ref))

    cases = [
        ("full bhp=1280", 1280, "full"),
        ("fullnomask 1280", 1280, "fullnomask"),
        ("slab2 1280", 1280, "slab2"),
        ("slab2nomask 1280", 1280, "slab2nomask"),
        ("slab2 2560", 2560, "slab2"),
        ("slab2 3200", 3200, "slab2"),
        ("roll 1280", 1280, "roll"),
        ("roll 2560", 2560, "roll"),
        ("roll 3200", 3200, "roll"),
    ]
    for name, bhp, mode in cases:
        try:
            if mode == "roll":
                fn0 = make_roll(bhp)
                fn = lambda a, b, c, d, _f=fn0: _f(a, d)
            else:
                fn = make(bhp, mode)
            got = fn(x2, x2, x2, wa).reshape(B, S, S, C)
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - ref.astype(jnp.float32))))
            tagerr = f"relerr={err / scale:.1e}"
            run = jax.jit(lambda a, b, _f=fn: jnp.sum(
                _f(a, a, a, b), dtype=jnp.float32))
            ms = timed(run, (x2, wa))
            print(f"{name:18s} {ms:8.3f} ms  {tf/(ms*1e-3):6.1f} TF/s  "
                  f"{tagerr}", flush=True)
        except Exception as e:  # noqa: BLE001
            s = str(e)
            j = s.find("Mosaic failed")
            print(f"{name:18s} FAIL {s[j:j+200] if j >= 0 else s[:200]}",
                  flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
