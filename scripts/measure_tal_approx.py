"""Measure the TPU TAL approximation against the exact reference ranking.

tpucv's task-aligned assigner uses ``jax.lax.approx_max_k`` with
recall_target=0.95 on TPU (tpucv/losses/tal.py) where the reference uses
exact torch.topk (core/utils/bboxes.py:313-333).  This script runs BOTH
paths on identical realistic batches and reports:

  * fg_mask agreement   — fraction of anchors with the same fg decision
  * fg Jaccard          — |fg_exact ∩ fg_approx| / |fg_exact ∪ fg_approx|
  * assignment agreement — among anchors fg in both, same target GT
  * score L1            — mean |target_scores_exact - target_scores_approx|

"Realistic" = GT layouts drawn like the synthetic trainer's (few boxes of
varied scale), predictions = perturbed GT boxes mixed with background noise
and scores correlated with overlap, i.e. a mid-training regime where the
metric has structure (the worst case for an approximate top-k is many
near-ties, which this produces around the box edges).

Run on the TPU:  python scripts/measure_tal_approx.py
(on CPU approx_max_k degenerates to exact; the numbers will be 1.0)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpucv.losses.tal import task_aligned_assigner
from tpucv.ops.anchors import make_anchors


def make_batch(rng, B=16, M=32, size=640, nc=80):
    strides = (8, 16, 32)
    feats = [(size // s, size // s) for s in strides]
    # PIXEL-space anchor centres, exactly as the production caller passes
    # them (yolov8_loss: anchor_points * stride_arr) — make_anchors returns
    # feature-grid units, which would collapse all FPN levels into an
    # 80x80-unit corner of the pixel-space GT boxes (code-review r3 fix)
    grid_anc, stride_arr = make_anchors(feats, strides)
    anc = grid_anc * stride_arr
    A = anc.shape[0]

    gt_boxes = np.zeros((B, M, 4), np.float32)
    gt_labels = np.zeros((B, M), np.int32)
    gt_mask = np.zeros((B, M), bool)
    for b in range(B):
        n = rng.integers(1, M // 2)
        wh = rng.uniform(20, 300, (n, 2))
        xy = rng.uniform(0, size - 1, (n, 2))
        x1y1 = np.clip(xy - wh / 2, 0, size - 1)
        x2y2 = np.clip(xy + wh / 2, 1, size)
        gt_boxes[b, :n] = np.concatenate([x1y1, x2y2], -1)
        gt_labels[b, :n] = rng.integers(0, nc, n)
        gt_mask[b, :n] = True

    # predictions: anchors near a GT predict a jittered version of it with
    # class scores peaked (but noisy) at the GT class; background anchors
    # predict noise — a mid-training checkpoint's statistics
    anc_np = np.asarray(anc)
    pd_boxes = np.zeros((B, A, 4), np.float32)
    pd_scores = rng.uniform(0, 0.05, (B, A, nc)).astype(np.float32)
    for b in range(B):
        n = int(gt_mask[b].sum())
        ctr = (gt_boxes[b, :n, :2] + gt_boxes[b, :n, 2:]) / 2
        d = np.linalg.norm(anc_np[:, None] - ctr[None], axis=-1)   # (A, n)
        nearest = d.argmin(1)
        near = d.min(1) < 160
        jitter = rng.normal(0, 8, (A, 4)).astype(np.float32)
        pd_boxes[b] = gt_boxes[b, nearest] + jitter
        far_boxes = np.concatenate(
            [anc_np - rng.uniform(5, 40, (A, 2)),
             anc_np + rng.uniform(5, 40, (A, 2))], -1).astype(np.float32)
        pd_boxes[b][~near] = far_boxes[~near]
        conf = np.clip(rng.normal(0.6, 0.25, A), 0, 1).astype(np.float32)
        pd_scores[b, np.arange(A), gt_labels[b, nearest]] = np.where(
            near, conf, pd_scores[b, np.arange(A), gt_labels[b, nearest]])
    return (jnp.asarray(pd_scores), jnp.asarray(pd_boxes), anc,
            jnp.asarray(gt_labels), jnp.asarray(gt_boxes),
            jnp.asarray(gt_mask))


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    # agreement stats computed ON DEVICE — fetching the raw (B, A, nc)
    # results through the axon relay D2H takes minutes (the relay degrades
    # after the first program execution); 7 scalars fetch instantly
    @jax.jit
    def compare(ps, pb, anc, gl, gb, gm):
        ex = task_aligned_assigner(ps, pb, anc, gl, gb, gm, exact=True)
        ap = task_aligned_assigner(ps, pb, anc, gl, gb, gm, exact=False)
        fe, fa = ex.fg_mask, ap.fg_mask
        both = fe & fa
        same_box = jnp.all(ex.target_bboxes == ap.target_bboxes, axis=-1)
        same_lbl = ex.target_labels == ap.target_labels
        return jnp.stack([
            jnp.asarray(fe.size, jnp.float32),
            (fe == fa).sum(dtype=jnp.float32),
            both.sum(dtype=jnp.float32),
            (fe | fa).sum(dtype=jnp.float32),
            (same_box & same_lbl & both).sum(dtype=jnp.float32),
            jnp.abs(ex.target_scores.astype(jnp.float32)
                    - ap.target_scores.astype(jnp.float32)).sum(),
            jnp.asarray(ex.target_scores.size, jnp.float32),
        ])

    import time
    tot = np.zeros(7)
    n_trials = int(os.environ.get("TAL_TRIALS", "4"))
    for trial in range(n_trials):
        t0 = time.time()
        tot += np.asarray(jax.device_get(compare(*make_batch(rng))))
        print(f"trial {trial}: {time.time() - t0:.1f}s", flush=True)

    anchors, fg_same, inter, union, same_tgt, l1, l1_n = tot
    print(f"fg_mask agreement:     {fg_same / anchors:.6f}")
    print(f"fg Jaccard:            {inter / max(union, 1):.6f}")
    print(f"assignment agreement:  {same_tgt / max(inter, 1):.6f}"
          f"   ({int(inter)} anchors fg in both)")
    print(f"target_scores mean L1: {l1 / max(l1_n, 1):.2e}")
    os._exit(0)     # axon backend teardown takes ~60s otherwise


if __name__ == "__main__":
    main()
