"""CenterNet fwd outlier (1.97x floor): decompose DLAUp and try a
phase-decomposed depthwise transposed conv.

Round-4 decomposition: backbone 17.4 ms + DLAUp 7.1 ms + heads ~0 at
B=64/384². The DLAUp 437 GB/s reading has ~1.5x headroom at the
fence-corrected ~670 GB/s stream rate. Two hypotheses:

(a) DepthwiseUp (lhs_dilation=2 depthwise 4x4) wastes VPU work: 16 taps
    per output, 12 of them multiplying inserted zeros. The sub-pixel
    ("phase") decomposition computes each output parity class with its
    own 2x2 depthwise conv (4 taps, no zeros) and interleaves:
      out[2a+py, 2b+px] = sum_{di,dj} K(py,px)[di,dj] * x[a+di-1+py, ...]
    with K built by slicing the stored 4x4 kernel by index parity.
(b) The node 3x3 convs at 64-128 cout are the cost (narrow-lane MXU,
    known architectural floor) and DepthwiseUp is noise.

This probe times, at the real shapes (B=64, input 384): full DLAUp,
each DepthwiseUp variant in isolation, and the node convs, all with the
fence-fit discipline (n=20/100/400, least-squares out the K/n term).

Run: python scripts/probe_dlaup.py [--batch 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, args, n):
    out = fn(*args)
    float(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(out.ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def fence_fit(fn, args, ns=(20, 100, 400)):
    pts = [(n, timed(fn, args, n)) for n in ns]
    A = np.array([[1.0, 1.0 / n] for n, _ in pts])
    y = np.array([ms for _, ms in pts])
    real, k = np.linalg.lstsq(A, y, rcond=None)[0]
    return float(real), pts


def report(name, fn, args, ns=(20, 100, 400)):
    real, pts = fence_fit(fn, args, ns)
    raw = "  ".join(f"n={n}:{ms:.3f}" for n, ms in pts)
    print(f"{name:46s} real {real:7.3f} ms   (raw {raw})", flush=True)
    return real


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from tpucv.models.centernet import DLAUp, DepthwiseUp, DLA34_CHANNELS

    B = args.batch
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    # real DLAUp input pyramid for 384^2 input: levels 2..5
    shapes = [(B, 96, 96, 64), (B, 48, 48, 128),
              (B, 24, 24, 256), (B, 12, 12, 512)]
    feats = [jnp.asarray(rng.standard_normal(s, np.float32), dt)
             for s in shapes]
    jax.block_until_ready(feats)

    dla_up = DLAUp(DLA34_CHANNELS[2:], dtype=dt)
    v = jax.jit(dla_up.init)(jax.random.PRNGKey(0), feats)

    fwd = jax.jit(lambda v, f: jnp.sum(dla_up.apply(v, f), dtype=jnp.float32)[None])
    report("DLAUp full (B=64, 96^2 out)", fwd, (v, list(feats)))

    # ---- DepthwiseUp in isolation at its real shapes --------------------
    for C, H in [(64, 48), (128, 24), (256, 12), (64, 96)]:
        x = jnp.asarray(rng.standard_normal((B, H, H, C), np.float32), dt)
        up = DepthwiseUp(C, 2, dtype=dt)
        uv = jax.jit(up.init)(jax.random.PRNGKey(1), x)
        f_dil = jax.jit(lambda v, x: jnp.sum(up.apply(v, x), dtype=jnp.float32)[None])
        t0 = report(f"DepthwiseUp dilated  C={C} {H}^2 -> {2*H}^2",
                    f_dil, (uv, x))

        w = uv["params"]["kernel"]          # (4, 4, 1, C) torch-indexed

        def phase_up(w, x):
            # K(py, px): row taps (w[3], w[1]) for py=0, (w[2], w[0]) for
            # py=1 (same for columns) — see module docstring derivation
            rows = [(3, 1), (2, 0)]
            outs = {}
            for py in (0, 1):
                for px in (0, 1):
                    k = jnp.stack(
                        [jnp.stack([w[rows[py][di], rows[px][dj], 0]
                                    for dj in (0, 1)])
                         for di in (0, 1)])          # (2, 2, C)
                    k = k[:, :, None, :].astype(x.dtype)   # (2,2,1,C) HWIO
                    pad = (((1, 0) if py == 0 else (0, 1)),
                           ((1, 0) if px == 0 else (0, 1)))
                    outs[(py, px)] = jax.lax.conv_general_dilated(
                        x, k, (1, 1), pad,
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        feature_group_count=x.shape[-1])
            r0 = jnp.stack([outs[(0, 0)], outs[(0, 1)]], axis=3)
            r1 = jnp.stack([outs[(1, 0)], outs[(1, 1)]], axis=3)
            y = jnp.stack([r0, r1], axis=2)   # (B, H, 2, W, 2+..., C)
            b, h, _, wd, _, c = y.shape
            return y.reshape(b, 2 * h, 2 * wd, c)

        f_ph = jax.jit(lambda w, x: jnp.sum(phase_up(w, x), dtype=jnp.float32)[None])
        t1 = report(f"DepthwiseUp phase4   C={C} {H}^2 -> {2*H}^2",
                    f_ph, (w, x))

        # correctness: identical math up to dtype rounding
        a = np.asarray(jax.device_get(
            jax.jit(up.apply)(uv, x)), np.float32)
        b_ = np.asarray(jax.device_get(jax.jit(phase_up)(w, x)),
                        np.float32)
        err = np.abs(a - b_).max()
        print(f"  max |dilated - phase| = {err:.2e}   "
              f"speedup {t0 / max(t1, 1e-9):.2f}x", flush=True)

    # ---- node convs (the narrow-lane suspects) ---------------------------
    import flax.linen as nn

    for cin, cout, H, label in [(128, 64, 96, "ida2 node"),
                                (256, 128, 48, "ida1 node"),
                                (512, 256, 24, "ida0 node")]:
        x = jnp.asarray(rng.standard_normal((B, H, H, cin), np.float32), dt)
        conv = nn.Conv(cout, (3, 3), padding=1, use_bias=False, dtype=dt)
        cv = jax.jit(conv.init)(jax.random.PRNGKey(2), x)
        f = jax.jit(lambda v, x: jnp.sum(conv.apply(v, x), dtype=jnp.float32)[None])
        ms = report(f"{label} 3x3 {cin}->{cout} @{H}^2", f, (cv, x))
        tf = 2 * B * H * H * 9 * cin * cout / 1e12
        print(f"  {tf / (ms * 1e-3):.1f} TF/s", flush=True)

    os._exit(0)


if __name__ == "__main__":
    main()
