"""Property test: fixpoint matrix NMS == sequential greedy NMS keep-set."""

import numpy as np

import jax.numpy as jnp

from tpucv.ops.nms import nms, nms_fixpoint


def _random_case(seed, n=64):
    rng = np.random.default_rng(seed)
    cxy = rng.uniform(0, 200, (n, 2))
    wh = rng.uniform(5, 80, (n, 2))
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], axis=1)
    scores = rng.uniform(0.01, 1.0, n)
    return jnp.asarray(boxes, jnp.float32), jnp.asarray(scores, jnp.float32)


def test_fixpoint_matches_scan_greedy():
    for seed in range(10):
        boxes, scores = _random_case(seed)
        i1, v1 = nms(boxes, scores, 0.5, 64)
        i2, v2 = nms_fixpoint(boxes, scores, 0.5, 64)
        keep1 = set(np.asarray(i1)[np.asarray(v1)].tolist())
        keep2 = set(np.asarray(i2)[np.asarray(v2)].tolist())
        assert keep1 == keep2, f"seed {seed}: {keep1} != {keep2}"


def test_fixpoint_handles_all_invalid():
    boxes = jnp.zeros((8, 4))
    scores = jnp.zeros((8,))
    _, valid = nms_fixpoint(boxes, scores, 0.5, 8)
    assert int(valid.sum()) == 0


def test_fixpoint_ordered_output():
    boxes, scores = _random_case(42)
    idx, valid = nms_fixpoint(boxes, scores, 0.5, 64)
    s = np.asarray(scores)[np.asarray(idx)][np.asarray(valid)]
    assert (np.diff(s) <= 1e-6).all()
