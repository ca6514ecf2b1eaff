"""BN/ReLU composition probe: where does SSD's backward lose 40 ms?

probe_conv_shapes.py showed isolated 3x3 dgrad/wgrad run 102-144 TF/s at
VGG widths, yet the whole SSD backward achieves ~82 TF/s. The remaining
suspects are the per-layer companions every VGG16-BN conv carries: the
train-mode BatchNorm (batch-stat reductions fwd, two more reduction passes
bwd) and the ReLU mask. This probe times fwd+bwd of one layer in four
compositions at the three dominant SSD widths:

  conv          — y = conv(x,w);             grads (dx, dw)
  conv_relu     — y = relu(conv+b)           grads (dx, dw)
  conv_bn_relu  — y = relu(bn_train(conv))   grads (dx, dw, dscale, dbias)
                  with mean/var over (B,H,W) computed in-graph, exactly
                  flax BatchNorm's train path
  bn_relu       — the BN+ReLU alone          (its own cost, for reference)

and a 3-layer stack of conv_bn_relu vs 3x the single-layer cost (does
composition itself add anything beyond the parts?).

Each program returns a f32 scalar (relay-safe fence); ~1 ms of relay
overhead rides on every number. Run: python scripts/probe_bn_bwd.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (tag, B, S, C) — 3x3 stride-1 SAME, Cin = Cout = C
SHAPES = [
    ("vgg conv2 128ch 150^2", 64, 150, 128),
    ("vgg conv3 256ch 75^2", 64, 75, 256),
    ("vgg conv4 512ch 38^2", 64, 38, 512),
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

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    dn = ("NHWC", "HWIO", "NHWC")

    print(f"{'shape':22s} {'prog':14s} {'ms':>8s} {'TF/s':>7s}", flush=True)
    for tag, B, S, C in SHAPES:
        key = jax.random.PRNGKey(0)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        x = jax.random.normal(k1, (B, S, S, C), jnp.bfloat16)
        w = jax.random.normal(k2, (3, 3, C, C), jnp.bfloat16) * 0.05
        sc = jax.random.normal(k3, (C,), jnp.float32) * 0.1 + 1.0
        bi = jax.random.normal(k4, (C,), jnp.float32) * 0.1
        jax.block_until_ready((x, w))
        tf = 2 * B * S * S * 9 * C * C / 1e12   # one conv fwd; bwd = 2x

        def conv(xx, ww):
            return lax.conv_general_dilated(
                xx, ww, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)

        def bn_relu_f(y, scale, bias):
            # flax BatchNorm train path: stats over (B,H,W) in f32
            yf = y.astype(jnp.float32)
            mu = jnp.mean(yf, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(yf), axis=(0, 1, 2)) - jnp.square(mu)
            yn = (yf - mu) * lax.rsqrt(var + 1e-5)
            return jax.nn.relu((yn * scale + bias).astype(jnp.bfloat16))

        def s(t):
            return jnp.sum(t, dtype=jnp.float32)

        r = jax.random.normal(jax.random.PRNGKey(7), (B, S, S, C),
                              jnp.bfloat16)

        def g_conv(xx, ww, rr):
            # sum(y*r), NOT sum(y): an all-ones cotangent lets XLA fold the
            # whole backward (measured >peak rates) — r makes dy real data.
            # rr must be an ARGUMENT: a closed-over array constant of this
            # size embeds in the compile payload and the relay rejects it
            # (HTTP 413). Note conv is linear, so XLA rightly DCEs the
            # forward here — this row measures dgrad+wgrad only (2x tf).
            dx, dw = jax.grad(
                lambda a, b: s(conv(a, b) * rr), (0, 1))(xx, ww)
            return s(dx) + s(dw)

        def g_conv_relu(xx, ww):
            f = lambda a, b: s(jax.nn.relu(conv(a, b)))  # noqa: E731
            dx, dw = jax.grad(f, (0, 1))(xx, ww)
            return s(dx) + s(dw)

        def g_conv_bn_relu(xx, ww, scale, bias):
            f = lambda a, b, c, d: s(bn_relu_f(conv(a, b), c, d))  # noqa: E731
            dx, dw, dsc, dbi = jax.grad(f, (0, 1, 2, 3))(xx, ww, scale, bias)
            return s(dx) + s(dw) + s(dsc) + s(dbi)

        def g_bn_relu(xx, scale, bias):
            f = lambda a, c, d: s(bn_relu_f(a, c, d))  # noqa: E731
            dx, dsc, dbi = jax.grad(f, (0, 1, 2))(xx, scale, bias)
            return s(dx) + s(dsc) + s(dbi)

        def g_stack3(xx, ww, scale, bias):
            def f(a, b, c, d):
                y = a
                for _ in range(3):
                    y = bn_relu_f(conv(y, b), c, d)
                return s(y)
            dx, dw, dsc, dbi = jax.grad(f, (0, 1, 2, 3))(xx, ww, scale, bias)
            return s(dx) + s(dw) + s(dsc) + s(dbi)

        runs = [
            ("conv_bwdonly", jax.jit(g_conv), (x, w, r), 2 * tf),
            ("conv_relu", jax.jit(g_conv_relu), (x, w), 3 * tf),
            ("conv_bn_relu", jax.jit(g_conv_bn_relu), (x, w, sc, bi), 3 * tf),
            ("bn_relu", jax.jit(g_bn_relu), (x, sc, bi), 0.0),
            ("stack3", jax.jit(g_stack3), (x, w, sc, bi), 9 * tf),
        ]
        for name, fn, args, ftot in runs:
            try:
                ms = timed(fn, args)
                rate = ftot / (ms * 1e-3) if ftot else 0.0
                print(f"{tag:22s} {name:14s} {ms:8.3f} {rate:7.1f}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{tag:22s} {name:14s} FAILED {type(e).__name__}: "
                      f"{str(e)[:80]}", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
