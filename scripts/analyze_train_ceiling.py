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
    from tpucv import models as M

    scale = sys.argv[1] if len(sys.argv) > 1 else "n"
    model = getattr(M, f"get_yolo8_{scale}")(dtype=jnp.bfloat16)
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

    whole_step_model(records, total, ceil)


def whole_step_model(records, fwd_flops_per_img, conv_ceil_tflops,
                     B=128, M=32, A=8400, NC=80, HBM_GBS=819.0):
    """First-order floor for the WHOLE train step (VERDICT r2 #3): conv
    fwd+bwd on the MXU model above, BN batch-stat traffic, the loss's
    HBM-bound tensor algebra, and optimizer/EMA state traffic — so 'near
    ceiling' is a claim about the step, not just the convs.

    Loss model: TAL + BCE + CIoU + DFL are elementwise/reduction chains —
    bandwidth, not FLOPs. We count the distinct materialised tensors between
    fusion barriers (reductions, top-k, matmuls force materialisation):
    TAL holds ~10 (B,M,A) bf16 live tensors (in-gts mask, gt_scores,
    overlaps, align, topk mask, mask_pos x2, norm-align chain), BCE fwd+bwd
    reads/writes ~5 (B,A,NC) tensors (logits, targets, bce, dlogits, sigmoid
    recompute), DFL fwd+bwd ~6 (B,A,64) (logits, log_softmax, one-hots
    contracted, dlogits), plus the (B,A,4/1) geometry chains (negligible).
    """
    bma = B * M * A * 2              # bf16 bytes
    banc = B * A * NC * 2
    ba64 = B * A * 64 * 2
    loss_bytes = 10 * bma + 5 * banc + 6 * ba64
    t_loss = loss_bytes / (HBM_GBS * 1e9) * 1e3

    # BN batch stats: one extra full read of every BN input for mean/var
    # plus the normalise pass re-read (eval mode fuses normalise into the
    # conv epilogue; train mode cannot because stats depend on the whole map)
    act_bytes = sum(ob * oh * ow * oc * 2
                    for (_, _, _, _), _, _, (ob, oh, ow, oc), _ in records)
    t_bn = 2 * act_bytes * B / (HBM_GBS * 1e9) * 1e3

    # conv fwd + bwd (dgrad+wgrad = 2x fwd FLOPs) at the conv ceiling
    t_fwd = B * fwd_flops_per_img / (conv_ceil_tflops * 1e12) * 1e3
    t_bwd = 2 * t_fwd

    # optimizer: adam reads g,p,m,v + writes p,m,v; EMA read+write (all f32)
    n_params = 3_157_200
    t_opt = 9 * n_params * 4 / (HBM_GBS * 1e9) * 1e3

    tot = t_fwd + t_bwd + t_bn + t_loss + t_opt
    print(f"\n--- whole-step floor @B={B} (conv MXU model + HBM {HBM_GBS:.0f}"
          f" GB/s) ---")
    print(f"conv fwd      {t_fwd:6.1f} ms")
    print(f"conv bwd      {t_bwd:6.1f} ms")
    print(f"BN stats      {t_bn:6.1f} ms   ({2 * act_bytes * B / 1e9:.1f} GB)")
    print(f"loss fwd+bwd  {t_loss:6.1f} ms   ({loss_bytes / 1e9:.1f} GB)")
    print(f"optimizer+EMA {t_opt:6.1f} ms")
    print(f"TOTAL FLOOR   {tot:6.1f} ms  -> {B / tot * 1e3:.0f} img/s ceiling"
          f" (measured: see scripts/analyze_train_step.py)")


if __name__ == "__main__":
    main()
