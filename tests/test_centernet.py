"""CenterNet model/targets/loss/decode tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucv.decode.centernet import decode_centernet
from tpucv.losses.centernet import centernet_loss
from tpucv.models.centernet import CenterNet
from tpucv.targets.centernet import (
    build_centernet_targets, gaussian_radius)


pytestmark = pytest.mark.slow  # heavy: full-model compiles

def test_gaussian_radius_reference_values():
    # radius should be positive and grow with box size
    r_small = float(gaussian_radius((jnp.float32(10), jnp.float32(10))))
    r_big = float(gaussian_radius((jnp.float32(100), jnp.float32(100))))
    assert 0 < r_small < r_big


def test_targets_peak_at_center():
    gt_boxes = jnp.array([[[40.0, 40.0, 120.0, 120.0]]])  # center (80,80)/4=20
    gt_labels = jnp.array([[2]])
    gt_mask = jnp.array([[True]])
    t = build_centernet_targets(gt_boxes, gt_labels, gt_mask, 5, (48, 48), 4)
    hm = np.asarray(t.heatmap[0, :, :, 2])
    assert abs(hm[20, 20] - 1.0) < 1e-5
    # other classes untouched
    assert np.asarray(t.heatmap[0, :, :, 0]).max() == 0.0
    np.testing.assert_allclose(np.asarray(t.wh[0, 0]), [20.0, 20.0])
    assert int(t.ind[0, 0]) == 20 * 48 + 20


def test_targets_two_boxes_same_class_max_merge():
    gt_boxes = jnp.array([[[0.0, 0, 80, 80], [20.0, 20, 100, 100]]])
    gt_labels = jnp.array([[1, 1]])
    gt_mask = jnp.array([[True, True]])
    t = build_centernet_targets(gt_boxes, gt_labels, gt_mask, 3, (32, 32), 4)
    hm = np.asarray(t.heatmap[0, :, :, 1])
    assert abs(hm[10, 10] - 1.0) < 1e-5
    assert abs(hm[15, 15] - 1.0) < 1e-5
    assert hm.max() <= 1.0 + 1e-6


def test_loss_finite_and_decreasing_toward_target():
    B, H, W, C = 1, 32, 32, 3
    gt_boxes = jnp.array([[[16.0, 16, 80, 80]]])
    gt_labels = jnp.array([[0]])
    gt_mask = jnp.array([[True]])
    t = build_centernet_targets(gt_boxes, gt_labels, gt_mask, C, (H, W), 4)
    bad = jnp.zeros((B, H, W, C + 4))
    # near-perfect logits: +9 at peaks, -9 elsewhere; exact wh/reg maps
    hm_logit = jnp.where(t.heatmap >= 1.0, 9.0, -9.0)
    wh_map = jnp.zeros((B, H, W, 2)).at[0, 12, 12].set(t.wh[0, 0])
    reg_map = jnp.zeros((B, H, W, 2)).at[0, 12, 12].set(t.reg[0, 0])
    good = jnp.concatenate([hm_logit, wh_map, reg_map], axis=-1)
    l_bad, _ = centernet_loss(bad, t, C)
    l_good, _ = centernet_loss(good, t, C)
    assert np.isfinite(float(l_bad)) and np.isfinite(float(l_good))
    assert float(l_good) < float(l_bad)


def test_decode_finds_planted_peak():
    B, H, W, C = 1, 32, 32, 3
    out = jnp.full((B, H, W, C + 4), -9.0)
    out = out.at[0, 10, 14, 1].set(9.0)               # strong peak class 1
    # channel contract is the reference's: offsets at [C:C+2], sizes at [-2:]
    out = out.at[0, 10, 14, C:C + 2].set(jnp.array([0.5, 0.5]))   # reg
    out = out.at[0, 10, 14, C + 2:].set(jnp.array([8.0, 6.0]))    # wh
    boxes, scores, cls, valid = decode_centernet(
        out, C, downsample=4, K=10, conf_threshold=0.3, use_diou_nms=False)
    v = np.asarray(valid[0])
    assert v.sum() == 1
    i = int(np.argmax(v))
    assert int(cls[0, i]) == 1
    b = np.asarray(boxes[0, i])
    # center (14.5, 10.5)*4 = (58, 42), wh (32, 24)
    np.testing.assert_allclose(b, [58 - 16, 42 - 12, 58 + 16, 42 + 12],
                               atol=1e-4)


def test_model_forward_shape():
    model = CenterNet(num_classes=5, head_channels=64)
    x = jnp.zeros((1, 128, 128, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = model.apply(vars_, x)
    assert out.shape == (1, 32, 32, 9)


def test_dla34_backbone_param_count_matches_reference():
    """Per-level DLA-34 parameter counts equal the reference exactly
    (verified against core/models/centernet_model.py DLA([1,1,1,2,2,1],
    [16,32,64,128,256,512]); its unused 'final' classifier excluded):
    base 2384, level0 2336, level1 4672, level2 140032, level3 1215488,
    level4 4855808, level5 9050112."""
    import jax.tree_util as tu
    from tpucv.models.centernet import DLA34
    m = DLA34()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    counts = {k: sum(x.size for x in tu.tree_leaves(sub))
              for k, sub in v["params"].items()}
    expected = {"base": 2384, "level0": 2336, "level1": 4672,
                "level2": 140032, "level3": 1215488, "level4": 4855808,
                "level5": 9050112}
    assert counts == expected
