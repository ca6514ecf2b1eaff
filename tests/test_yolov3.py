"""YOLOv3 legacy-path tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tpucv.decode.yolov3 import raw_to_pred_yolo3
from tpucv.losses.yolov3 import make_yolov3_targets, yolov3_loss
from tpucv.models.yolov3 import YoloV3

ANCHORS = np.array([[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
                    [59, 119], [116, 90], [156, 198], [373, 326]], np.float32)
MASK = ((6, 7, 8), (3, 4, 5), (0, 1, 2))
STRIDES = (32, 16, 8)


def test_model_output_shapes():
    model = YoloV3(nc=80)
    x = jnp.zeros((1, 128, 128, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    outs = model.apply(vars_, x)
    no = 3 * 85
    assert [o.shape for o in outs] == [
        (1, 4, 4, no), (1, 8, 8, no), (1, 16, 16, no)]


def test_targets_assign_to_best_anchor_level():
    # big box (300x300) -> anchor 8 (373, 326) -> level 0 (stride 32)
    gt = jnp.array([[[10.0, 10, 310, 310]]])
    labels = jnp.array([[5]])
    mask = jnp.array([[True]])
    ts = make_yolov3_targets(gt, labels, mask, ANCHORS, MASK, STRIDES,
                             [(13, 13), (26, 26), (52, 52)], 80)
    assert float(ts[0][..., 4].sum()) == 1.0   # exactly one cell at level 0
    assert float(ts[1][..., 4].sum()) == 0.0
    assert float(ts[2][..., 4].sum()) == 0.0
    b, cy, cx, a = np.unravel_index(
        int(np.argmax(np.asarray(ts[0][..., 4]))), ts[0].shape[:4])
    assert (cy, cx) == (5, 5)   # center 160/32 = 5
    assert int(a) == 2          # anchor 8 is local index 2


def test_loss_finite_and_grads():
    key = jax.random.PRNGKey(0)
    maps = [0.01 * jax.random.normal(k, (1, h, h, 3 * 85))
            for k, h in zip(jax.random.split(key, 3), (4, 8, 16))]
    gt = jnp.array([[[10.0, 10, 100, 100]]])
    labels = jnp.array([[3]])
    mask = jnp.array([[True]])
    total, parts = yolov3_loss(maps, gt, labels, mask, ANCHORS, MASK,
                               STRIDES, 80)
    assert np.isfinite(float(total))

    def f(s):
        t, _ = yolov3_loss([m * s for m in maps], gt, labels, mask,
                           ANCHORS, MASK, STRIDES, 80)
        return t

    g = jax.grad(f)(1.0)
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_decode_zero_logits_geometry():
    maps = [jnp.zeros((1, 2, 2, 3 * 85)), jnp.zeros((1, 4, 4, 3 * 85)),
            jnp.zeros((1, 8, 8, 3 * 85))]
    boxes, scores = raw_to_pred_yolo3(maps, ANCHORS, MASK, STRIDES, 80)
    b0 = np.asarray(boxes[0, 0])
    # level 0 cell (0,0) anchor 6 (116, 90): center = 0.5*32
    np.testing.assert_allclose(
        b0, [16 - 58, 16 - 45, 16 + 58, 16 + 45], atol=1e-4)
