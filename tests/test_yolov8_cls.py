"""YOLOv8 classification family (``yolo8_cls``) — the reference ships the
yolov8-cls spec (``core/models/yolov8/yolov8-cls.yaml``) and the Classify
head (``modules.py:509-528``) but no pipeline; tpucv registers a full one
on the CSPDarknet backbone (layers 0-8, no SPPF/FPN)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_cfg():
    from tpucv.builder import export_from_registry
    cfg, algo_cls, trainer_cls = export_from_registry("yolo8_cls")
    cfg.dataset.input_size = 64
    cfg.n_classes = 4
    cfg.train.batch_size = 4
    cfg.train.epochs = 1
    cfg.train.eval_interval = 1
    cfg.train.save_interval = 1000
    cfg.log.print_interval = 1
    cfg.log.tensorboard_on = False
    cfg.train.mixed_precision = False
    return cfg, algo_cls, trainer_cls


def test_registry_round_trip():
    cfg, algo_cls, trainer_cls = _tiny_cfg()
    assert cfg.model_name == "yolo8_cls"
    assert algo_cls.__name__ == "YOLOv8Cls"
    assert trainer_cls.__name__ == "Yolo8ClsTrainer"


def test_classify_forward_shape_and_backbone_only():
    cfg, algo_cls, _ = _tiny_cfg()
    algo = algo_cls(cfg)
    model = algo.build_model()
    variables = algo.init_variables(model)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    logits = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
    assert logits.shape == (2, 4)
    # backbone-only graph: no SPPF (b9) and no FPN/detect params
    top = variables["params"].keys()
    assert "classify" in top and "b8" in top
    assert "b9" not in top and "h12" not in top and "detect" not in top


def test_infer_fn_softmax():
    cfg, algo_cls, _ = _tiny_cfg()
    algo = algo_cls(cfg)
    variables = algo.init_variables()
    infer = algo.make_infer_fn()
    imgs = np.random.default_rng(0).integers(
        0, 255, (2, 64, 64, 3), dtype=np.uint8)
    probs = np.asarray(infer(variables, jnp.asarray(imgs)))
    assert probs.shape == (2, 4)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)


@pytest.mark.slow
def test_yolo8_cls_one_train_step_and_eval(tmp_path):
    cfg, _, trainer_cls = _tiny_cfg()
    cfg.train.save_path = str(tmp_path / "saves")
    cfg.log.root = str(tmp_path / "log")
    trainer = trainer_cls(cfg)
    state = trainer.train(max_steps=1)
    assert int(state.step) == 1
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert "val_acc" in trainer.last_eval
