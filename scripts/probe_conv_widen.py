"""Pure-XLA narrow-conv reformulations: widen 64ch convs to 128 lanes.

XLA runs 3x3 convs at ~131-144 TF/s at >=128 channels but ~35 at 64ch —
consistent with padding both channel dims to 128 (4x waste). These
reformulations pay only 2x FLOPs by packing TWO images into the channel
dim with a block-diagonal kernel:

  blockdiag  — x2 = concat(x[0::2], x[1::2], axis=C) -> conv with
               w2 = [[w, 0], [0, w]] (128->128) -> split back
  batchgroup — lax batch_group_count=2 with tiled weights (XLA's internal
               regrouping; output channel-major over groups)
  zeropad    — x padded to 128ch with zeros (4x FLOPs; expected no win,
               calibrates the "XLA pads to 128" hypothesis)

All bf16; numerics asserted vs the plain conv. Timing includes the
concat/split glue, since production would pay it too (unless fused).
Run: python scripts/probe_conv_widen.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = [
    ("64ch 320^2 B32", 32, 320, 64),
    ("64ch 296^2 B64", 64, 296, 64),
    ("32ch 192^2 B64", 64, 192, 32),
]


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

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    dn = ("NHWC", "HWIO", "NHWC")

    print(f"{'shape':16s} {'prog':11s} {'ms':>8s} {'TF/s':>7s}", flush=True)
    for tag, B, S, C in SHAPES:
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(k1, (B, S, S, C), jnp.bfloat16)
        w = jax.random.normal(k2, (3, 3, C, C), jnp.bfloat16) * 0.1
        jax.block_until_ready((x, w))
        tf = 2 * B * S * S * 9 * C * C / 1e12
        M = 128 // C  # images merged to reach 128 lanes

        def conv(xx, ww, **kw):
            return lax.conv_general_dilated(
                xx, ww, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn, **kw)

        def plain(xx):
            return conv(xx, w)

        # block-diagonal widened kernel
        wbd = jnp.zeros((3, 3, M * C, M * C), w.dtype)
        for m in range(M):
            wbd = wbd.at[:, :, m * C:(m + 1) * C, m * C:(m + 1) * C].set(w)

        def blockdiag(xx):
            xs = jnp.concatenate([xx[m::M] for m in range(M)], axis=-1)
            y = conv(xs, wbd)
            parts = [y[..., m * C:(m + 1) * C] for m in range(M)]
            # xs image b holds x[b*M + m] in channel slot m, so stacking
            # parts on axis 1 and flattening restores the original order
            return jnp.stack(parts, axis=1).reshape(B, S, S, C)

        # batch_group_count: groups along batch, tiled weights
        wtile = jnp.concatenate([w] * M, axis=-1)     # (3,3,C,M*C)

        def batchgroup(xx):
            y = conv(xx, wtile, batch_group_count=M)  # (B/M, S, S, M*C)
            # feature group m is conv of the CONTIGUOUS batch group m
            parts = [y[..., m * C:(m + 1) * C] for m in range(M)]
            return jnp.concatenate(parts, axis=0)

        # zero-pad channels to 128 (hypothesis calibration)
        wpad = jnp.zeros((3, 3, 128, 128), w.dtype)
        wpad = wpad.at[:, :, :C, :C].set(w)

        def zeropad(xx):
            xp = jnp.pad(xx, ((0, 0), (0, 0), (0, 0), (0, 128 - C)))
            return conv(xp, wpad)[..., :C]

        ref = plain(x)
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9
        runs = [("plain", plain)]
        for name, fn in (("blockdiag", blockdiag),
                         ("batchgroup", batchgroup), ("zeropad", zeropad)):
            try:
                got = fn(x)
                if name == "batchgroup":
                    # batch groups take CONTIGUOUS input blocks: group m is
                    # x[m*B/M:(m+1)*B/M] -> out ordering already matches
                    pass
                err = float(jnp.max(jnp.abs(
                    got.astype(jnp.float32) - ref.astype(jnp.float32))))
                if err / scale > 2e-2:
                    print(f"{tag:16s} {name:11s} WRONG relerr="
                          f"{err / scale:.3e}", flush=True)
                    continue
                runs.append((name, fn))
            except Exception as e:  # noqa: BLE001
                print(f"{tag:16s} {name:11s} FAIL {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)
        for name, fn in runs:
            f = jax.jit(lambda xx, _f=fn: jnp.sum(_f(xx),
                                                  dtype=jnp.float32))
            ms = timed(f, (x,))
            print(f"{tag:16s} {name:11s} {ms:8.3f} {tf/(ms*1e-3):7.1f}",
                  flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
