"""YOLOv8-pose family: head, kpt decode, loss direction, data, trainer
smoke. (No reference counterpart — the torch repo's pose work is an
unfinished CPM file.)"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_cfg():
    from tpucv.builder import export_from_registry
    cfg, algo_cls, trainer_cls = export_from_registry("yolo8_pose")
    cfg.dataset.input_size = 64
    cfg.dataset.max_num_boxes = 4
    cfg.arch.kpt_shape = (5, 3)
    cfg.train.batch_size = 2
    cfg.train.epochs = 1
    cfg.train.eval_interval = 1000
    cfg.train.save_interval = 1000
    cfg.log.print_interval = 1
    cfg.log.tensorboard_on = False
    cfg.train.mixed_precision = False
    cfg.decode.pre_nms_topk = 64
    cfg.decode.max_det = 10
    cfg.loss.pose_topk = 8
    return cfg, algo_cls, trainer_cls


def test_pose_model_forward_shapes():
    from tpucv.models.yolov8 import Yolo8
    m = Yolo8(scale="n", nc=1, head="pose", kpt_shape=(5, 3))
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    det, kpts = m.apply(v, x)
    assert det[0].shape == (1, 8, 8, 64 + 1)
    assert kpts[0].shape == (1, 8, 8, 15)


def test_decode_kpts_flat_anchor_relative():
    """A zero kpt map must decode to the anchor centre in pixels."""
    from tpucv.losses.yolov8_pose import decode_kpts_flat
    maps = [jnp.zeros((1, 4, 4, 6)), jnp.zeros((1, 2, 2, 6)),
            jnp.zeros((1, 1, 1, 6))]
    out = decode_kpts_flat(maps, (2, 3), (8, 16, 32))
    assert out.shape == (1, 16 + 4 + 1, 2, 3)
    # first anchor of the stride-8 level sits at grid (0.5, 0.5) -> px 0
    np.testing.assert_allclose(np.asarray(out[0, 0, 0, :2]), [0.0, 0.0],
                               atol=1e-5)
    # second anchor (grid x=1.5): (0*2 + 1.5 - 0.5) * 8 = 8
    np.testing.assert_allclose(np.asarray(out[0, 1, 0, :2]), [8.0, 0.0],
                               atol=1e-5)


def test_pose_loss_prefers_correct_keypoints():
    from tpucv.losses.yolov8_pose import yolov8_pose_loss

    B, nc, rm, nk = 1, 1, 16, 5
    key = jax.random.PRNGKey(0)
    det_maps = [jax.random.normal(key, (B, s, s, 4 * rm + nc)) * 0.1
                for s in (8, 4, 2)]
    gt_boxes = jnp.asarray([[[8.0, 8.0, 48.0, 48.0]]])
    gt_labels = jnp.asarray([[0]], jnp.int32)
    gt_valid = jnp.asarray([[True]])
    # gt keypoints at box centre, visible
    gk = np.zeros((B, 1, nk, 3), np.float32)
    gk[..., 0] = 28.0
    gk[..., 1] = 28.0
    gk[..., 2] = 2.0

    def run(bias):
        # kpt maps biased so decoded xy land near (28, 28) vs far away:
        # at stride 8, anchor ~ (3.5): x = (k*2 + 3.0) * 8 -> k = (28/8-3)/2
        kmaps = []
        for s, st in ((8, 8), (4, 16), (2, 32)):
            m = np.zeros((B, s, s, nk * 3), np.float32)
            m[..., 0::3] = bias
            m[..., 1::3] = bias
            kmaps.append(jnp.asarray(m))
        _, metrics = yolov8_pose_loss(
            (det_maps, kmaps), gt_labels, gt_boxes, gt_valid,
            jnp.asarray(gk), nc=nc, reg_max=rm, pose_topk=8)
        return float(metrics["kpt_loss"])

    # bias 0 keeps kpts at anchor centres (close to GT for anchors inside
    # the box); bias 20 shoves every kpt hundreds of px away
    assert run(0.0) < run(20.0)


def test_synthetic_pose_index_and_dataset():
    from tpucv.data.pose_dataset import (
        PoseDataset, SyntheticPoseIndex, pose_collate)
    idx = SyntheticPoseIndex(4, 64, nk=5, seed=0)
    k = idx.keypoints(0)
    _, boxes, _ = idx[0]
    assert k.shape == (len(boxes), 5, 3)
    # keypoints inside their boxes
    for j in range(len(boxes)):
        x1, y1, x2, y2 = boxes[j]
        assert (k[j, :, 0] >= x1).all() and (k[j, :, 0] <= x2).all()
        assert (k[j, :, 1] >= y1).all() and (k[j, :, 1] <= y2).all()
    ds = PoseDataset(idx, 64, 4, nk=5)
    item = ds[0]
    assert item["gt_kpts"].shape == (4, 5, 3)
    batch = pose_collate([ds[0], ds[1]])
    assert batch["gt_kpts"].shape == (2, 4, 5, 3)


def test_coco_keypoint_index(tmp_path):
    import json
    from tpucv.data.pose_dataset import COCOKeypointIndex
    kp = [10.0, 10.0, 2.0] * 17
    js = {
        "images": [{"id": 1, "file_name": "a.jpg", "height": 64, "width": 64}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "iscrowd": 0,
             "num_keypoints": 17, "keypoints": kp,
             "bbox": [5.0, 5.0, 20.0, 20.0]},
            {"id": 2, "image_id": 1, "category_id": 1, "iscrowd": 0,
             "num_keypoints": 0, "keypoints": [0.0] * 51,
             "bbox": [1.0, 1.0, 2.0, 2.0]},       # skipped: no kpts
        ],
        "categories": [{"id": 1, "name": "person"}],
    }
    (tmp_path / "kp.json").write_text(json.dumps(js))
    idx = COCOKeypointIndex(str(tmp_path / "kp.json"), str(tmp_path))
    assert len(idx) == 1
    _, boxes, labels = idx[0]
    assert boxes.shape == (1, 4) and labels.tolist() == [0]
    assert idx.keypoints(0).shape == (1, 17, 3)


def test_decode_pose_shapes():
    from tpucv.decode.yolov8_pose import decode_pose
    B, nc, rm, nk = 1, 1, 16, 5
    rng = np.random.default_rng(0)
    det_maps = [jnp.asarray(rng.normal(size=(B, s, s, 4 * rm + nc))
                            .astype(np.float32)) for s in (8, 4, 2)]
    kpt_maps = [jnp.asarray(rng.normal(size=(B, s, s, nk * 3))
                            .astype(np.float32)) for s in (8, 4, 2)]
    out = decode_pose((det_maps, kpt_maps), kpt_shape=(nk, 3), nc=nc,
                      reg_max=rm, conf_threshold=0.01, max_det=6,
                      pre_nms_topk=32)
    boxes, scores, classes, valid, kpts = out
    assert kpts.shape == (B, 6, nk, 3)
    vis = np.asarray(kpts[..., 2])
    assert (vis >= 0).all() and (vis <= 1).all()     # sigmoided


@pytest.mark.slow
def test_pose_one_train_step(tmp_path):
    cfg, _, trainer_cls = _tiny_cfg()
    cfg.train.save_path = str(tmp_path / "saves")
    cfg.log.root = str(tmp_path / "log")
    trainer = trainer_cls(cfg)
    state = trainer.train(max_steps=1)
    assert int(state.step) == 1
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


@pytest.mark.slow
def test_pose_predict_returns_keypoints(tmp_path):
    cfg, algo_cls, _ = _tiny_cfg()
    algo = algo_cls(cfg)
    variables = algo.init_variables()
    img = np.random.default_rng(0).integers(
        0, 255, (80, 60, 3), dtype=np.uint8)
    res = algo.predict(variables, img, save_dir=str(tmp_path))
    assert "keypoints" in res
    if len(res["keypoints"]):
        assert res["keypoints"].shape[1:] == (5, 3)


@pytest.mark.slow
def test_pose_predict_with_cli_infer_fn(tmp_path):
    """Regression: predict.py prebuilds algo.make_predict_infer_fn and
    passes it in — for pose that must be the 5-output keypoint contract,
    not the boxes-only eval fn (which crashed the CLI drive)."""
    cfg, algo_cls, _ = _tiny_cfg()
    algo = algo_cls(cfg)
    model = algo.build_model()
    variables = algo.init_variables(model)
    infer_fn = algo.make_predict_infer_fn(model)
    img = np.random.default_rng(1).integers(
        0, 255, (80, 60, 3), dtype=np.uint8)
    res = algo.predict(variables, img, infer_fn=infer_fn,
                       save_dir=str(tmp_path))
    assert "keypoints" in res
