"""Pallas NMS kernel vs reference greedy NMS (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from tpucv.ops.nms import nms, nms_fixpoint
from tpucv.ops.pallas_nms import pallas_nms


def _case(seed, n=128):
    rng = np.random.default_rng(seed)
    cxy = rng.uniform(0, 300, (n, 2))
    wh = rng.uniform(5, 120, (n, 2))
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], axis=1)
    scores = rng.uniform(0.01, 1.0, n)
    return (jnp.asarray(boxes, jnp.float32)[None],
            jnp.asarray(scores, jnp.float32)[None])


def test_pallas_nms_matches_greedy():
    for seed in range(5):
        boxes, scores = _case(seed)
        idx_p, v_p = pallas_nms(boxes, scores, 0.5, 128, interpret=True)
        idx_s, v_s = nms(boxes[0], scores[0], 0.5, 128)
        keep_p = set(np.asarray(idx_p[0])[np.asarray(v_p[0])].tolist())
        keep_s = set(np.asarray(idx_s)[np.asarray(v_s)].tolist())
        assert keep_p == keep_s, f"seed {seed}"


def test_pallas_nms_batched():
    b1, s1 = _case(10)
    b2, s2 = _case(11)
    boxes = jnp.concatenate([b1, b2])
    scores = jnp.concatenate([s1, s2])
    idx, valid = pallas_nms(boxes, scores, 0.5, 32, interpret=True)
    assert idx.shape == (2, 32)
    # per-image results match running each alone
    idx1, v1 = pallas_nms(b1, s1, 0.5, 32, interpret=True)
    assert set(np.asarray(idx[0])[np.asarray(valid[0])].tolist()) == \
        set(np.asarray(idx1[0])[np.asarray(v1[0])].tolist())


def test_pallas_nms_deep_suppression_chain():
    """A 60-deep chain of pairwise-overlapping boxes with descending scores:
    greedy keeps every second box. The suppression wave needs ~chain-depth
    sweeps, exercising the run-to-fixpoint while_loop (the old bounded
    16-sweep kernel under-suppressed here)."""
    n_chain, N = 60, 64
    boxes = np.zeros((1, N, 4), np.float32)
    scores = np.zeros((1, N), np.float32)
    for i in range(n_chain):
        # each box overlaps its neighbour at IoU 8/12=0.67 (>0.5) and its
        # second neighbour at 6/14=0.43 (<0.5): suppression chains, greedy
        # keeps evens
        boxes[0, i] = [i * 2.0, 0, i * 2.0 + 10.0, 10.0]
        scores[0, i] = 1.0 - i * 0.01
    idx_p, v_p = pallas_nms(jnp.asarray(boxes), jnp.asarray(scores),
                            0.5, N, interpret=True)
    idx_s, v_s = nms(jnp.asarray(boxes[0]), jnp.asarray(scores[0]), 0.5, N)
    keep_p = sorted(np.asarray(idx_p[0])[np.asarray(v_p[0])].tolist())
    keep_s = sorted(np.asarray(idx_s)[np.asarray(v_s)].tolist())
    assert keep_p == keep_s
    assert keep_p == list(range(0, n_chain, 2))  # greedy keeps evens


def test_presorted_matches_unsorted_path():
    """presorted=True on already-descending scores (the production decode
    feeds lax.top_k output) must give the same keep-set as the argsort
    path."""
    rng = np.random.default_rng(5)
    B, N = 3, 96
    boxes = np.zeros((B, N, 4), np.float32)
    xy = rng.random((B, N, 2)).astype(np.float32) * 100
    wh = rng.random((B, N, 2)).astype(np.float32) * 40 + 5
    boxes[..., :2] = xy
    boxes[..., 2:] = xy + wh
    scores = -np.sort(-rng.random((B, N)).astype(np.float32), axis=-1)
    idx_a, v_a = pallas_nms(jnp.asarray(boxes), jnp.asarray(scores),
                            0.5, 30, interpret=True)
    idx_b, v_b = pallas_nms(jnp.asarray(boxes), jnp.asarray(scores),
                            0.5, 30, interpret=True, presorted=True)
    for b in range(B):
        ka = sorted(np.asarray(idx_a[b])[np.asarray(v_a[b])].tolist())
        kb = sorted(np.asarray(idx_b[b])[np.asarray(v_b[b])].tolist())
        assert ka == kb


def test_chain_deeper_than_old_64_sweep_cap():
    """120-deep suppression chain: the sweep bound now defaults to N, so
    chains deeper than the old 64-iteration cap resolve exactly."""
    n_chain, N = 120, 128
    boxes = np.zeros((1, N, 4), np.float32)
    scores = np.zeros((1, N), np.float32)
    for i in range(n_chain):
        boxes[0, i] = [i * 2.0, 0, i * 2.0 + 10.0, 10.0]
        scores[0, i] = 1.0 - i * 0.005
    idx_p, v_p = pallas_nms(jnp.asarray(boxes), jnp.asarray(scores),
                            0.5, N, interpret=True)
    keep_p = sorted(np.asarray(idx_p[0])[np.asarray(v_p[0])].tolist())
    assert keep_p == list(range(0, n_chain, 2))
    idx_f, v_f = jax.vmap(
        lambda b, s: nms_fixpoint(b, s, 0.5, N))(
        jnp.asarray(boxes), jnp.asarray(scores))
    keep_f = sorted(np.asarray(idx_f[0])[np.asarray(v_f[0])].tolist())
    assert keep_f == keep_p
