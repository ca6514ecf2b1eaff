"""E-ELAN block-level probe: is there byte headroom XLA leaves on the table?

The YOLOv7-l step decomposition (docs/performance.md) put the train step at
78% of its HBM roofline and named "a Pallas multi-conv E-ELAN block keeping
branch outputs in VMEM" as the candidate byte-reduction. Before building
that kernel, this probe measures what XLA actually does with the block at
eval semantics (BN folded — the inference path a fused kernel would target):

  base    — the block as the model writes it: cv1/cv2 1x1, a chain of n 3x3
            convs, concat of the selected outputs, cv4 1x1
            (reference Multi_Concat_Block, yolo_v7/yolov7_model.py:28-52)
  nocat   — cv4's weight split per branch: out = silu(sum_k sel_k @ W4_k + b)
            — removes the concat materialization if XLA wasn't already
            fusing it into cv4's input
  chain   — the 3x3 chain alone (the part a Pallas kernel must beat)
  catonly — concat of the four branch-shaped tensors + nothing (measures
            what the concat itself costs inside XLA's schedule)

Per variant: measured ms, XLA cost-model flops/bytes, achieved TF/s + GB/s.
Shapes are the four backbone + four head ELANs of yolov7-l at B=32, 640².
Run: python scripts/probe_eelan.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (tag, S, Cin, mid, mid2, n, n_sel)  — yolov7-l PHI: ids pick 4 of 6 for
# backbone ELANs, all 6 for head ELANs (models/yolov7.py PHI)
BLOCKS = [
    ("elan1 160^2 128->256", 160, 128, 64, 64, 4, 4),
    ("elan2 80^2 256->512", 80, 256, 128, 128, 4, 4),
    ("elan3 40^2 512->1024", 40, 512, 256, 256, 4, 4),
    ("elan4 20^2 1024->1024", 20, 1024, 256, 256, 4, 4),
    ("helan1 40^2 512->256", 40, 512, 256, 128, 4, 6),
    ("helan2 80^2 256->128", 80, 256, 128, 64, 4, 6),
]
B = 32
PEAK_TF, PEAK_BW = 197e12, 819e9


def timed(fn, args, n=20):
    out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / n * 1e3


def cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return ca.get("flops", float("nan")), ca.get("bytes accessed",
                                                 float("nan"))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    dn = ("NHWC", "HWIO", "NHWC")

    def conv(x, w, b, k):
        pad = ((k // 2, k // 2),) * 2
        y = lax.conv_general_dilated(x, w, (1, 1), pad, dimension_numbers=dn)
        return jax.nn.silu(y + b)

    print(f"{'block':24s} {'prog':8s} {'ms':>8s} {'TF':>7s} {'GB':>7s} "
          f"{'TF/s':>6s} {'GB/s':>5s} {'floor':>7s}", flush=True)

    for tag, S, Cin, mid, mid2, n, n_sel in BLOCKS:
        key = jax.random.PRNGKey(0)
        ks = iter(jax.random.split(key, 32))
        nrm = lambda *sh: jax.random.normal(next(ks), sh, jnp.bfloat16)  # noqa: E731
        x = nrm(B, S, S, Cin)
        w1 = nrm(1, 1, Cin, mid) * 0.1
        w2 = nrm(1, 1, Cin, mid) * 0.1
        b1, b2 = nrm(mid) * 0.1, nrm(mid) * 0.1
        wc = [nrm(3, 3, mid if i == 0 else mid2, mid2) * 0.05
              for i in range(n)]
        bc = [nrm(mid2) * 0.1 for _ in range(n)]
        ccat = 2 * mid + (n_sel - 2) * mid2
        cout = 2 * mid if n_sel == 4 else ccat // 2
        w4 = nrm(1, 1, ccat, cout) * 0.1
        b4 = nrm(cout) * 0.1
        jax.block_until_ready((x, w4))

        def branches(xx):
            x1 = conv(xx, w1, b1, 1)
            x2 = conv(xx, w2, b2, 1)
            outs = [x1, x2]
            y = x2
            for i in range(n):
                y = conv(y, wc[i], bc[i], 3)
                outs.append(y)
            if n_sel == 4:
                sel = [outs[i] for i in (-1, -3, -5, -6)]
            else:
                sel = [outs[i] for i in (-1, -2, -3, -4, -5, -6)]
            return sel

        def base(xx):
            y = jnp.concatenate(branches(xx), axis=-1)
            y = conv(y, w4, b4, 1)
            return jnp.sum(y, dtype=jnp.float32)

        def nocat(xx):
            sel = branches(xx)
            acc = b4.astype(jnp.float32)
            o = 0
            accs = None
            for t in sel:
                c = t.shape[-1]
                part = lax.conv_general_dilated(
                    t, w4[:, :, o:o + c, :], (1, 1), ((0, 0), (0, 0)),
                    dimension_numbers=dn, preferred_element_type=jnp.float32)
                accs = part if accs is None else accs + part
                o += c
            y = jax.nn.silu(accs + acc)
            return jnp.sum(y, dtype=jnp.float32)

        def chain(xx):
            x2 = conv(xx, w2, b2, 1)
            y = x2
            for i in range(n):
                y = conv(y, wc[i], bc[i], 3)
            return jnp.sum(y, dtype=jnp.float32)

        def catonly(xx):
            sel = branches(xx)
            y = jnp.concatenate(sel, axis=-1)
            return jnp.sum(y, dtype=jnp.float32)

        for name, fn in [("base", base), ("nocat", nocat),
                         ("chain", chain), ("catonly", catonly)]:
            try:
                jf = jax.jit(fn)
                comp = jf.lower(x).compile()
                f, by = cost(comp)
                ms = timed(jf, (x,))
                floor = max(f / PEAK_TF, by / PEAK_BW) * 1e3
                print(f"{tag:24s} {name:8s} {ms:8.3f} {f/1e12:7.3f} "
                      f"{by/1e9:7.2f} {f/(ms*1e-3)/1e12:6.1f} "
                      f"{by/(ms*1e-3)/1e9:5.0f} {floor:7.3f}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{tag:24s} {name:8s} FAILED {type(e).__name__}: "
                      f"{str(e)[:80]}", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
