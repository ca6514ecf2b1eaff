"""SSD model / targets / loss / decode tests (reference anchors: 8732 priors
for 300 input, ssd.py:540; encode/decode roundtrip; hard-negative mining)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucv.losses.multibox import multibox_loss
from tpucv.models.ssd import SSD
from tpucv.ops.anchors import generate_ssd_anchors
from tpucv.targets.ssd import (
    assign_ssd_targets, decode_boxes, encode_boxes)

PRIORS_300 = dict(
    input_size=300,
    feature_shapes=[38, 19, 10, 5, 3, 1],
    anchor_sizes=[30, 60, 111, 162, 213, 264, 315],
    aspect_ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]],
)


pytestmark = pytest.mark.slow  # heavy: full-model compiles

def test_ssd300_forward_shapes():
    model = SSD(num_classes=21, input_size=300)
    x = jnp.zeros((1, 300, 300, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    loc, conf = model.apply(vars_, x)
    assert loc.shape == (1, 8732, 4)
    assert conf.shape == (1, 8732, 21)


def test_encode_decode_roundtrip():
    priors = jnp.array([[0.1, 0.1, 0.3, 0.3], [0.5, 0.5, 0.9, 0.9]])
    gt = jnp.array([[0.12, 0.1, 0.33, 0.28], [0.4, 0.5, 0.8, 0.95]])
    enc = encode_boxes(gt, priors)
    dec = decode_boxes(enc, priors)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(gt), atol=1e-5)


def test_assignment_best_prior_forced():
    priors = generate_ssd_anchors(**PRIORS_300)
    # tiny GT that overlaps nothing above 0.5 still gets its best prior
    gt_boxes = jnp.array([[0.48, 0.48, 0.52, 0.52]])
    gt_labels = jnp.array([3])
    gt_mask = jnp.array([True])
    t = assign_ssd_targets(gt_boxes, gt_labels, gt_mask, priors, 0.5)
    assert int(t.pos_mask.sum()) >= 1
    assigned_cls = np.asarray(t.cls)[np.asarray(t.pos_mask)]
    assert (assigned_cls == 4).all()  # class+1


def test_assignment_empty_image():
    priors = generate_ssd_anchors(**PRIORS_300)
    t = assign_ssd_targets(
        jnp.zeros((2, 4)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2,), bool), priors, 0.5)
    assert int(t.pos_mask.sum()) == 0
    assert (np.asarray(t.cls) == 0).all()


def test_multibox_loss_hard_negative_count():
    B, A, nc = 2, 64, 5
    key = jax.random.PRNGKey(0)
    loc_pred = jax.random.normal(key, (B, A, 4))
    conf_pred = jax.random.normal(key, (B, A, nc))
    loc_true = jnp.zeros((B, A, 4))
    cls_true = jnp.zeros((B, A), jnp.int32).at[0, :4].set(1)
    pos = jnp.zeros((B, A), bool).at[0, :4].set(True)
    total, parts = multibox_loss(loc_pred, conf_pred, loc_true, cls_true, pos)
    assert np.isfinite(float(total))
    assert float(parts["num_pos"]) == 4


def test_multibox_loss_gradients():
    B, A, nc = 1, 32, 3
    key = jax.random.PRNGKey(1)
    conf_pred = jax.random.normal(key, (B, A, nc))
    pos = jnp.zeros((B, A), bool).at[0, 0].set(True)
    cls_true = jnp.zeros((B, A), jnp.int32).at[0, 0].set(2)

    def f(scale):
        total, _ = multibox_loss(
            jnp.ones((B, A, 4)) * scale, conf_pred * scale,
            jnp.zeros((B, A, 4)), cls_true, pos)
        return total

    g = jax.grad(f)(1.0)
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_ssd300_param_count_exact_reference():
    """Structurally exact to the reference: 26,293,934 params (VGG-BN bias
    convs, BN-less conv6/7, plain biased extras)."""
    import jax.tree_util as tu
    m = SSD(num_classes=21, input_size=300)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3)))
    assert sum(x.size for x in tu.tree_leaves(v["params"])) == 26_293_934
