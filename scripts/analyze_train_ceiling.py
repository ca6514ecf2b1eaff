"""Analytic MXU-utilization ceiling for YOLOv8n training on TPU v5e.

Walks every conv in the model (via flax tabulate), computes FLOPs and a
first-order MXU efficiency model for the implicit GEMM each conv lowers to
(M = B*H*W, K = kh*kw*Cin, N = Cout on a 128x128 systolic array):

    eff = min(N, 128)/128 * min(K, 128)/128-ceil * HBM correction (ignored)

i.e. output channels < 128 leave MXU lanes idle; K < 128 leaves rows idle.
Prints the FLOP-weighted achievable fraction of peak -- the number that
explains why a 3.2M-param net with 16-256 channel widths cannot reach
the 197 TFLOP/s bf16 peak regardless of software.

Usage: JAX_PLATFORMS=cpu python scripts/analyze_train_ceiling.py
"""

import re
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
    rows = []

    # capture conv shapes via the tabulate machinery
    table = nn.tabulate(
        model, jax.random.PRNGKey(0),
        compute_flops=False, compute_vjp_flops=False,
    )(jnp.zeros((1, 640, 640, 3), jnp.bfloat16))

    # parse "Conv" rows: inputs (1,H,W,Cin), kernel (kh,kw,Cin,Cout)
    for line in table.splitlines():
        if "| Conv" not in line and "ConvT" not in line:
            continue
        shapes = re.findall(r"\(([\d, ]+)\)", line)
        if len(shapes) < 2:
            continue
        try:
            inp = [int(x) for x in shapes[0].split(",") if x.strip()]
            ker = None
            for s in shapes[1:]:
                v = [int(x) for x in s.split(",") if x.strip()]
                if len(v) == 4 and v[2] == inp[-1]:
                    ker = v
                    break
            if ker is None or len(inp) != 4:
                continue
        except ValueError:
            continue
        _, h, w, cin = inp
        kh, kw, _, cout = ker
        # stride: out spatial = last output shape in the row
        out = [int(x) for x in shapes[-1].split(",") if x.strip()]
        oh, ow = (out[1], out[2]) if len(out) == 4 else (h, w)
        flops = 2 * kh * kw * cin * cout * oh * ow       # per image
        K, N = kh * kw * cin, cout
        eff = min(N, MXU) / MXU * min(K, MXU) / MXU if K < MXU else \
            min(N, MXU) / MXU * (K / (MXU * -(-K // MXU)))
        rows.append((f"{kh}x{kw} {cin:4d}->{cout:4d} @{oh}x{ow}",
                     flops, eff))

    total = sum(f for _, f, _ in rows)
    # time at peak*eff per layer; ceiling = total / sum(time)
    t_sum = sum(f / (PEAK_TFLOPS * e) for _, f, e in rows)
    ceiling = total / t_sum / 1e12 * 1e12  # TFLOP/s aggregate

    agg = {}
    for name, f, e in rows:
        key = name.split("@")[0]
        a = agg.setdefault(key, [0, e, 0])
        a[0] += f
        a[2] += 1
    print(f"{'conv shape':28s} {'GFLOP/img':>10s} {'%FLOPs':>7s} "
          f"{'MXU eff':>8s} {'n':>3s}")
    for key, (f, e, n) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        print(f"{key:28s} {f/1e9:10.3f} {100*f/total:6.1f}% {e:7.1%} {n:3d}")
    print(f"\ntotal fwd: {total/1e9:.2f} GFLOP/img "
          f"(reference claims 8.9 incl. non-conv)")
    print(f"FLOP-weighted MXU ceiling: {total / t_sum / 1e12:.0f} TFLOP/s "
          f"of {PEAK_TFLOPS:.0f} peak "
          f"({total / t_sum / 1e12 / PEAK_TFLOPS:.0%})")


if __name__ == "__main__":
    main()
