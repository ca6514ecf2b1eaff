"""Per-stage timing of the task-aligned assigner on TPU (B=128, M=32,
A=8400) — cumulative prefixes; successive differences give stage costs.

Run: python scripts/profile_tal_stages.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpucv.losses.tal import (
    select_candidates_in_gts, select_highest_overlaps, task_aligned_assigner)
from tpucv.ops.boxes import pairwise_ciou


def timed(fn, args, n=10):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    B, M, A, nc = 128, 32, 8400, 80
    # inputs generated ON DEVICE: a 344 MB device_put through the relay's
    # degraded H2D state (~0.02 GB/s) takes hours (see docs/performance.md
    # relay caveats)
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    ps = jax.random.uniform(ks[0], (B, A, nc), jnp.float32).astype(jnp.bfloat16)
    pb = jax.random.uniform(ks[1], (B, A, 4), jnp.float32) * 640
    anc = jax.random.uniform(ks[2], (A, 2), jnp.float32) * 640
    gl = jax.random.randint(ks[3], (B, M), 0, nc, jnp.int32)
    gb = jax.random.uniform(ks[4], (B, M, 4), jnp.float32) * 640
    gm = jnp.ones((B, M), bool)
    cdt = jnp.bfloat16

    @jax.jit
    def s1_in_gts(pb, gb):
        return select_candidates_in_gts(anc, gb).sum(dtype=jnp.float32)

    @jax.jit
    def s2_scores(ps, gl):
        oh = jax.nn.one_hot(jnp.clip(gl, 0, nc - 1), nc, dtype=cdt)
        gs = jnp.einsum("bmn,ban->bma", oh, ps,
                        preferred_element_type=jnp.float32).astype(cdt)
        return gs.sum(dtype=jnp.float32)

    @jax.jit
    def s3_ciou(gb, pb):
        ov = jnp.clip(pairwise_ciou(gb.astype(cdt), pb.astype(cdt)), 0)
        return ov.sum(dtype=jnp.float32)

    @jax.jit
    def s4_align_topk(ps, pb, gl, gb, gm):
        oh = jax.nn.one_hot(jnp.clip(gl, 0, nc - 1), nc, dtype=cdt)
        gs = jnp.einsum("bmn,ban->bma", oh, ps,
                        preferred_element_type=jnp.float32).astype(cdt)
        ov = jnp.clip(pairwise_ciou(gb.astype(cdt), pb.astype(cdt)), 0)
        align = jnp.sqrt(gs) * ov**6
        valid = select_candidates_in_gts(anc, gb) & gm[..., None]
        align = jnp.where(valid, align, 0.0)
        tv, _ = jax.lax.approx_max_k(align, 10, recall_target=0.95)
        mask = (align >= jnp.maximum(tv[..., -1:], 1e-9)) & (align > 1e-9)
        return mask.sum(dtype=jnp.float32) + ov.sum(dtype=jnp.float32)

    @jax.jit
    def s5_full(ps, pb, gl, gb, gm):
        r = task_aligned_assigner(ps, pb, anc, gl, gb, gm)
        return r.target_scores.sum(dtype=jnp.float32)

    print(f"s1 in_gts      {timed(s1_in_gts, (pb, gb)):7.2f} ms", flush=True)
    print(f"s2 scores      {timed(s2_scores, (ps, gl)):7.2f} ms", flush=True)
    print(f"s3 ciou        {timed(s3_ciou, (gb, pb)):7.2f} ms", flush=True)
    print(f"s4 align+topk  {timed(s4_align_topk, (ps, pb, gl, gb, gm)):7.2f} ms",
          flush=True)
    print(f"s5 full        {timed(s5_full, (ps, pb, gl, gb, gm)):7.2f} ms",
          flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
