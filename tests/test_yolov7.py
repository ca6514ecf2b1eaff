"""YOLOv7 model/loss/decode tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucv.decode.yolov7 import decode_yolov7, raw_to_pred_yolo7
from tpucv.losses.yolov7 import yolov7_loss
from tpucv.models.yolov7 import Yolo7

ANCHORS = np.array([
    [[12, 16], [19, 36], [40, 28]],
    [[36, 75], [76, 55], [72, 146]],
    [[142, 110], [192, 243], [459, 401]],
], np.float32)


pytestmark = pytest.mark.slow  # heavy: full-model compiles

def test_model_output_shapes():
    model = Yolo7(nc=20, phi="l")
    x = jnp.zeros((1, 128, 128, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    outs = model.apply(vars_, x)
    no = 3 * 25
    assert [o.shape for o in outs] == [
        (1, 16, 16, no), (1, 8, 8, no), (1, 4, 4, no)]


def test_decode_grid_parameterisation():
    # zero logits: sigmoid=0.5 -> xy = (0.5*2-0.5+grid)*s = (grid+0.5)*s,
    # wh = (1)^2 * anchor
    maps = [jnp.zeros((1, 2, 2, 3 * 25)), jnp.zeros((1, 1, 1, 3 * 25)),
            jnp.zeros((1, 1, 1, 3 * 25))]
    boxes, scores = raw_to_pred_yolo7(maps, ANCHORS, (8, 16, 32), 20)
    b0 = np.asarray(boxes[0, 0])   # first anchor of cell (0,0), layer 0
    cx, cy = 0.5 * 8, 0.5 * 8
    w, h = 12, 16
    np.testing.assert_allclose(
        b0, [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], atol=1e-5)
    # scores = sigmoid(0)^2 = 0.25
    np.testing.assert_allclose(np.asarray(scores).max(), 0.25, atol=1e-6)


def test_loss_finite_and_matches_exist():
    key = jax.random.PRNGKey(0)
    shapes = [(8, 8), (4, 4), (2, 2)]
    maps = [0.01 * jax.random.normal(k, (2, h, w, 3 * 25))
            for k, (h, w) in zip(jax.random.split(key, 3), shapes)]
    gt_boxes = jnp.array([[[10.0, 10, 40, 40], [20.0, 20, 60, 62]],
                          [[5.0, 5, 30, 26], [0, 0, 0, 0]]])
    gt_labels = jnp.array([[1, 2], [3, 0]])
    gt_mask = jnp.array([[True, True], [True, False]])
    total, parts = yolov7_loss(
        maps, gt_boxes, gt_labels, gt_mask, ANCHORS, (8, 16, 32), nc=20)
    assert np.isfinite(float(total))
    assert float(parts["num_match"]) >= 3  # each GT gets >= 1 anchor


def test_loss_empty_image():
    key = jax.random.PRNGKey(1)
    shapes = [(8, 8), (4, 4), (2, 2)]
    maps = [0.01 * jax.random.normal(k, (1, h, w, 3 * 25))
            for k, (h, w) in zip(jax.random.split(key, 3), shapes)]
    total, parts = yolov7_loss(
        maps, jnp.zeros((1, 2, 4)), jnp.zeros((1, 2), jnp.int32),
        jnp.zeros((1, 2), bool), ANCHORS, (8, 16, 32), nc=20)
    assert np.isfinite(float(total))
    assert float(parts["num_match"]) == 0


def test_loss_gradients_flow():
    key = jax.random.PRNGKey(2)
    shapes = [(8, 8), (4, 4), (2, 2)]
    maps = [0.01 * jax.random.normal(k, (1, h, w, 3 * 25))
            for k, (h, w) in zip(jax.random.split(key, 3), shapes)]
    gt_boxes = jnp.array([[[10.0, 10, 40, 40]]])
    gt_labels = jnp.array([[1]])
    gt_mask = jnp.array([[True]])

    def f(s):
        total, _ = yolov7_loss(
            [m * s for m in maps], gt_boxes, gt_labels, gt_mask,
            ANCHORS, (8, 16, 32), nc=20)
        return total

    g = jax.grad(f)(1.0)
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_decode_fixed_shapes():
    maps = [jnp.zeros((2, 4, 4, 3 * 25)), jnp.zeros((2, 2, 2, 3 * 25)),
            jnp.zeros((2, 1, 1, 3 * 25))]
    boxes, scores, cls, valid = decode_yolov7(
        maps, ANCHORS, (8, 16, 32), 20, 0.5, 0.3, 10, 64)
    assert boxes.shape == (2, 10, 4)
    assert valid.dtype == jnp.bool_


def test_yolov7_param_counts_match_reference():
    """Exact parity with the torch reference at nc=20 for both variants
    (verified against core/models/yolov7_model.py): l=37,297,025,
    x=70,940,649."""
    import jax.tree_util as tu
    for phi, expected in (("l", 37_297_025), ("x", 70_940_649)):
        m = Yolo7(nc=20, phi=phi)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
        assert sum(x.size for x in tu.tree_leaves(v["params"])) == expected, phi
