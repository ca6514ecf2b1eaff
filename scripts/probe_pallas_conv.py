"""Pallas narrow-channel conv probe (the round-5 "real frontier").

probe_conv_shapes.py established that 3x3 stride-1 convs at <=64 channels
run 25-35 TF/s under XLA while the same op at 128ch runs ~131 — and
probe_conv_widen.py confirmed why: zero-padding channels to 128 costs
XLA only 1.3x the time at 4x the FLOPs, i.e. XLA computes the padded
conv anyway. This kernel pays only 128/C FLOP waste instead of
(128/C)^2: pack G = 128/C consecutive pixels into each 128-lane row,
then accumulate 9 (rows, 128) x (128, 128) MXU GEMMs against a
block-structured weight matrix W[(du,dp),k'C+ci, jC+co] =
w[du, G*dp+k'-j+1, ci, co].

Kernel structure (best of the v1/v2 decompositions, see
probe_pallas_conv_parts.py / probe_pallas_conv_v2.py):
  - lag-one rolling scratch: at grid step i the only HBM fetch is block
    i; blocks i-1, i-2 are in VMEM scratch; output block i-1 is computed
    (1x input DMA, full auto-pipelining)
  - image-boundary (du) handling via zero-select on whole blocks, NOT
    per-piece masks (masks measured 3.8 ms of the 8.6 ms v1 kernel)
  - row-boundary (dp=+-1) masks pre-folded into two shifted slab copies

Measured (64ch 320^2 B32): XLA 7.0 ms / this kernel 5.2-5.4 ms (1.3x);
both sit near the chip's ~400 GB/s effective stream floor + MXU time.

Run:  python scripts/probe_pallas_conv.py
"""

import functools
import os
import sys
import time


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (tag, B, S, C, BHP): 3x3 stride-1 SAME, Cin = Cout = C, square input.
# Constraints: S % (128//C) == 0, BHP % 8 == 0, BHP >= S*C/128 + 2,
# IMG % BHP == 0 where IMG = S^2*C/128.
SHAPES = [
    ("y8n p3 64ch 80^2 B128", 128, 80, 64, 1600),
    ("y8n p2 32ch 160^2 B128", 128, 160, 32, 1600),
    ("y8n p1 16ch 320^2 B128", 128, 320, 16, 1600),
    ("ssd conv1_2 64ch 300^2 B64", 64, 300, 64, 1000),
    ("cn 64ch 96^2 B64", 64, 96, 64, 1536),
    ("probe 64ch 320^2 B32", 32, 320, 64, 3200),
]


def timed(fn, args, n=30):
    out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / n * 1e3


def build_packed_conv(B, S, C, BHP):
    """3x3 s1 SAME conv for (B,S,S,C) bf16, C in {16,32,64}.

    Returns (run, pack_weights): run(x, wa) -> y, with wa = pack_weights(w)
    for w in HWIO layout (3, 3, C, C).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = 128 // C
    assert C * G == 128 and S % G == 0
    SPR = S // G                  # packed rows per image row
    IMG = S * SPR                 # packed rows per image
    TOT = B * IMG
    assert BHP % 8 == 0 and BHP >= SPR + 2 and IMG % BHP == 0
    NBLK = TOT // BHP
    BPI = IMG // BHP

    copies = [(du, dp) for du in range(3) for dp in (-1, 0, 1)]

    def kernel(cur_ref, w_ref, out_ref, scr):
        i = pl.program_id(0)
        o = i - 1                 # output block index this step computes
        zero = jnp.zeros((1, 1), cur_ref.dtype)

        @pl.when(i > 0)
        def _compute():
            pm1 = scr[(i - 1) % 2]                    # block o
            # zero-select whole neighbor blocks at image boundaries:
            # the conv's zero padding at image top/bottom
            pm2 = jnp.where((o % BPI) == 0, zero, scr[i % 2])
            nxt = jnp.where((o % BPI) == BPI - 1, zero, cur_ref[:])
            slab = jnp.concatenate([pm2, pm1, nxt], axis=0)
            iota = jax.lax.broadcasted_iota(jnp.int32, (3 * BHP, 1), 0)
            sp = (o * BHP + iota - BHP) % SPR
            lo = BHP - SPR - 1
            hi = 2 * BHP + SPR + 1
            # dp=+-1 shifted slabs with the row-boundary mask pre-folded
            sm = jnp.where(sp[lo + 1: hi - 1] != 0, slab[lo: hi - 2], 0)
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

        scr[i % 2] = cur_ref[:]   # save block i for the next two steps

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
        out_specs=pl.BlockSpec((BHP, 128), lambda i: (cin(i - 1), 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TOT, 128), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((2, BHP, 128), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(
            flops=2 * TOT * 9 * 128 * 128,
            bytes_accessed=2 * 2 * TOT * 128,
            transcendentals=0),
    )

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

    def run(x, wa):
        y = fn(x.reshape(TOT, 128), wa)
        return y.reshape(B, S, S, C)

    return run, pack_weights


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    dn = ("NHWC", "HWIO", "NHWC")

    print(f"{'shape':28s} {'prog':12s} {'ms':>8s} {'TF/s':>7s}", flush=True)
    for tag, B, S, C, BHP in SHAPES:
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(k1, (B, S, S, C), jnp.bfloat16)
        w = jax.random.normal(k2, (3, 3, C, C), jnp.bfloat16) * 0.1
        jax.block_until_ready((x, w))
        tf = 2 * B * S * S * 9 * C * C / 1e12

        def xla_fwd(xx):
            return lax.conv_general_dilated(
                xx, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)

        runs = [("xla_fwd", jax.jit(
            lambda xx: jnp.sum(xla_fwd(xx), dtype=jnp.float32)))]
        try:
            run, pack_weights = build_packed_conv(B, S, C, BHP)
            wa = pack_weights(w)
            ref = xla_fwd(x)
            got = run(x, wa)
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - ref.astype(jnp.float32))))
            scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9
            if err / scale > 2e-2:
                print(f"{tag:28s} {'pallas_pack':12s} WRONG "
                      f"relerr={err / scale:.3e}", flush=True)
            else:
                runs.append(("pallas_pack", jax.jit(
                    lambda xx, _r=run, _w=wa: jnp.sum(
                        _r(xx, _w), dtype=jnp.float32))))
        except Exception as e:  # noqa: BLE001
            print(f"{tag:28s} {'pallas_pack':12s} BUILD-FAIL "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)

        for name, fn in runs:
            try:
                ms = timed(fn, (x,))
                print(f"{tag:28s} {name:12s} {ms:8.3f} {tf/(ms*1e-3):7.1f}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{tag:28s} {name:12s} RUN-FAIL {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
