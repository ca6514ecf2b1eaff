"""Inventory-extra losses + device util."""

import jax
import jax.numpy as jnp
import numpy as np


def test_varifocal_finite():
    from tpucv.losses.extras import varifocal_loss
    logits = jnp.zeros((2, 8, 3))
    gt_score = jnp.full((2, 8, 3), 0.5)
    label = jnp.zeros((2, 8, 3)).at[:, :2, 0].set(1.0)
    v = varifocal_loss(logits, gt_score, label)
    assert np.isfinite(float(v)) and float(v) > 0


def test_keypoint_loss_zero_when_exact():
    from tpucv.losses.extras import keypoint_loss
    kpts = jnp.ones((1, 4, 17, 2))
    mask = jnp.ones((1, 4, 17))
    area = jnp.ones((1, 4))
    sig = jnp.full((17,), 0.05)
    loss = keypoint_loss(kpts, kpts, mask, area, sig)
    assert abs(float(loss)) < 1e-6


def test_iou_loss_modes():
    from tpucv.losses.extras import iou_loss
    a = jnp.array([10.0, 10, 4, 4])
    b = jnp.array([10.0, 10, 4, 4])
    assert abs(float(iou_loss(a, b))) < 1e-5
    c = jnp.array([30.0, 30, 4, 4])
    assert float(iou_loss(a, c, mode="giou")) > 1.0  # disjoint: giou < 0


def test_multibox_v1_close_to_v2_on_uniform_batch():
    from tpucv.losses.extras import multibox_loss_v1
    from tpucv.losses.multibox import multibox_loss
    key = jax.random.PRNGKey(0)
    B, A, nc = 2, 32, 4
    loc_pred = jax.random.normal(key, (B, A, 4))
    conf_pred = jax.random.normal(key, (B, A, nc))
    loc_true = jnp.zeros((B, A, 4))
    cls_true = jnp.zeros((B, A), jnp.int32).at[:, :3].set(1)
    pos = jnp.zeros((B, A), bool).at[:, :3].set(True)
    v1, _ = multibox_loss_v1(loc_pred, conf_pred, loc_true, cls_true, pos)
    v2, parts = multibox_loss(loc_pred, conf_pred, loc_true, cls_true, pos)
    # v1 and v2 normalise/blend differently (reference multi_box_loss.py:
    # 50-64 vs :185-191) — check both are finite, positive, same magnitude
    assert np.isfinite(float(v1)) and np.isfinite(float(v2))
    assert float(v1) > 0 and float(v2) > 0
    assert 0.05 < float(v1) / float(v2) < 20.0


def test_device_utils():
    from tpucv.utils.device import device_summary, get_device
    d = get_device("cpu")
    assert d.platform == "cpu"
    assert "process" in device_summary()
