"""Analytic MXU-utilization ceiling for YOLOv8n training on TPU v5e.

Records every conv in the model (by intercepting flax ``nn.Conv`` during an
abstract trace at 640^2), computes FLOPs and a first-order MXU efficiency
model for the implicit GEMM each conv lowers to (M = B*H*W, K = kh*kw*Cin,
N = Cout on a 128x128 systolic array):

    eff = min(N, 128)/128 * K / (128 * ceil(K/128))

i.e. output channels < 128 leave MXU lanes idle; K not a multiple of 128
pads rows. Prints the FLOP-weighted achievable fraction of peak — the
number that explains why a 3.2M-param net with 16-256 channel widths cannot
reach the 197 TFLOP/s bf16 peak regardless of software.

Usage: JAX_PLATFORMS=cpu python scripts/analyze_train_ceiling.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

PEAK_TFLOPS = 197.0     # v5e bf16
MXU = 128


def main():
    import flax.linen as nn
    from tpucv.models import get_yolo8_n

    model = get_yolo8_n(dtype=jnp.bfloat16)
    records = []
    orig = nn.Conv.__call__

    def patched(self, x):
        y = orig(self, x)
        ks = self.kernel_size
        k = ks[0] if isinstance(ks, (tuple, list)) else ks
        records.append((x.shape, k, self.features, y.shape,
                        getattr(self, "feature_group_count", 1)))
        return y

    nn.Conv.__call__ = patched
    try:
        jax.eval_shape(model.init, jax.random.PRNGKey(0),
                       jnp.zeros((1, 640, 640, 3), jnp.bfloat16))
    finally:
        nn.Conv.__call__ = orig

    rows = []
    for (b, h, w, cin), k, cout, (ob, oh, ow, oc), groups in records:
        cin_g = cin // groups
        flops = 2 * k * k * cin_g * cout * oh * ow     # per image
        K, N = k * k * cin_g, cout // groups
        eff = (min(N, MXU) / MXU) * (K / (MXU * -(-K // MXU)))
        rows.append((f"{k}x{k} {cin:4d}->{cout:4d} @{oh}x{ow}", flops,
                     min(eff, 1.0)))

    total = sum(f for _, f, _ in rows)
    eff_hmean = total / sum(f / e for _, f, e in rows)

    agg = {}
    for name, f, e in rows:
        key = name.split("@")[0]
        a = agg.setdefault(key, [0, e, 0])
        a[0] += f
        a[2] += 1
    print(f"{'conv shape':22s} {'GFLOP/img':>10s} {'%FLOPs':>7s} "
          f"{'MXU eff':>8s} {'n':>3s}")
    for key, (f, e, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:14]:
        print(f"{key:22s} {f/1e9:10.3f} {100*f/total:6.1f}% {e:7.1%} {n:3d}")
    ceil = PEAK_TFLOPS * eff_hmean
    print(f"\ntotal fwd conv: {total/1e9:.2f} GFLOP/img "
          f"(reference claims 8.9 GFLOPs incl. non-conv)")
    print(f"FLOP-weighted MXU ceiling: {ceil:.0f} TFLOP/s of "
          f"{PEAK_TFLOPS:.0f} peak ({eff_hmean:.0%})")
    print(f"=> best-case fwd {128 * total/(ceil*1e12)*1e3:.1f} ms per "
          f"128-image batch; backward ~2x that.")


if __name__ == "__main__":
    main()
