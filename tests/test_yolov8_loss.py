"""TAL assigner + YOLOv8 loss behaviour tests (toy cases mirroring the
reference semantics of core/utils/bboxes.py:275-470 and
core/algorithms/yolo_v8.py:25-124)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpucv.losses.tal import select_candidates_in_gts, task_aligned_assigner
from tpucv.losses.yolov8 import yolov8_loss
from tpucv.ops.anchors import make_anchors


def test_select_candidates_in_gts():
    anc = jnp.array([[5.0, 5.0], [50.0, 50.0]])
    gts = jnp.array([[[0.0, 0, 10, 10]]])  # (1,1,4)
    mask = select_candidates_in_gts(anc, gts)
    assert mask.shape == (1, 1, 2)
    assert bool(mask[0, 0, 0]) and not bool(mask[0, 0, 1])


def _toy_assignment():
    # 8x8 grid of stride-1 anchors
    pts, _ = make_anchors([(8, 8)], (1,))
    A = 64
    nc = 3
    gt_boxes = jnp.array([[[1.0, 1.0, 5.0, 5.0], [0, 0, 0, 0]]])  # (1,2,4)
    gt_labels = jnp.array([[1, 0]])
    gt_mask = jnp.array([[True, False]])
    # predictions: perfect box at every anchor, confident class 1
    pd_boxes = jnp.broadcast_to(jnp.array([1.0, 1.0, 5.0, 5.0]), (1, A, 4))
    pd_scores = jnp.full((1, A, nc), 0.05).at[..., 1].set(0.9)
    return pd_scores, pd_boxes, pts, gt_labels, gt_boxes, gt_mask


def test_assigner_assigns_inside_anchors():
    pd_scores, pd_boxes, pts, gl, gb, gm = _toy_assignment()
    res = task_aligned_assigner(pd_scores, pd_boxes, pts, gl, gb, gm,
                                topk=10, num_classes=3)
    fg = np.asarray(res.fg_mask[0])
    # anchors inside the GT box (x,y in (1,5)) are 16; top-k caps at 10 but
    # the TPU-shaped selection is tie-INCLUSIVE (threshold at the k-th
    # value), and in this toy case all 16 candidates tie exactly — any 10
    # would be an arbitrary subset, so all 16 are kept.
    assert 10 <= fg.sum() <= 16
    # all assigned anchors get label 1 and the GT box
    lbl = np.asarray(res.target_labels[0])[fg]
    assert (lbl == 1).all()
    tb = np.asarray(res.target_bboxes[0])[fg]
    np.testing.assert_allclose(tb, np.tile([1, 1, 5, 5], (fg.sum(), 1)))
    # padding GT assigned nothing
    assert not np.asarray(res.target_scores[0])[~fg].any()


def test_assigner_empty_image():
    pd_scores, pd_boxes, pts, gl, gb, _ = _toy_assignment()
    gm = jnp.array([[False, False]])
    res = task_aligned_assigner(pd_scores, pd_boxes, pts, gl, gb, gm,
                                topk=10, num_classes=3)
    assert int(res.fg_mask.sum()) == 0
    assert float(res.target_scores.sum()) == 0.0


def _raw_maps(key, B=2, nc=4, reg_max=16, shapes=((8, 8), (4, 4), (2, 2))):
    no = 4 * reg_max + nc
    ks = jax.random.split(key, len(shapes))
    return [0.01 * jax.random.normal(k, (B, h, w, no))
            for k, (h, w) in zip(ks, shapes)]


def test_loss_finite_and_componentwise():
    key = jax.random.PRNGKey(0)
    maps = _raw_maps(key)
    gl = jnp.array([[0, 1], [2, 0]])
    gb = jnp.array([[[4.0, 4, 20, 20], [30, 30, 50, 50]],
                    [[8.0, 8, 40, 40], [0, 0, 0, 0]]])
    gm = jnp.array([[True, True], [True, False]])
    total, parts = yolov8_loss(maps, gl, gb, gm, nc=4, strides=(8, 16, 32))
    assert np.isfinite(float(total))
    for v in parts.values():
        assert np.isfinite(float(v))
    assert float(parts["num_fg"]) > 0


def test_loss_empty_batch_no_nan():
    key = jax.random.PRNGKey(1)
    maps = _raw_maps(key)
    gl = jnp.zeros((2, 2), jnp.int32)
    gb = jnp.zeros((2, 2, 4))
    gm = jnp.zeros((2, 2), bool)
    total, parts = yolov8_loss(maps, gl, gb, gm, nc=4, strides=(8, 16, 32))
    assert np.isfinite(float(total))
    assert float(parts["num_fg"]) == 0


def test_loss_gradients_flow():
    key = jax.random.PRNGKey(2)
    maps = _raw_maps(key, B=1)
    gl = jnp.array([[1]])
    gb = jnp.array([[[4.0, 4, 30, 30]]])
    gm = jnp.array([[True]])

    def f(scale):
        total, _ = yolov8_loss([m * scale for m in maps], gl, gb, gm, nc=4,
                               strides=(8, 16, 32))
        return total

    g = jax.grad(f)(1.0)
    assert np.isfinite(float(g)) and abs(float(g)) > 0
