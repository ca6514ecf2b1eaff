"""Device-side augmentation wired into the trainer: one train step with
device_aug on must run and keep boxes/masks consistent."""

import jax
import numpy as np
import pytest


pytestmark = pytest.mark.slow  # heavy: full-model compiles

def test_train_step_with_device_aug(tmp_path):
    from tpucv.builder import export_from_registry
    cfg, _, trainer_cls = export_from_registry("yolo8_det")
    cfg.dataset.input_size = 96
    cfg.dataset.max_num_boxes = 8
    cfg.train.batch_size = 8
    cfg.train.epochs = 1
    cfg.train.eval_interval = 1000
    cfg.train.save_interval = 1000
    cfg.train.mixed_precision = False
    cfg.train.device_aug = True
    cfg.log.print_interval = 1
    cfg.log.tensorboard_on = False
    cfg.train.save_path = str(tmp_path / "saves")
    cfg.log.root = str(tmp_path / "log")
    trainer = trainer_cls(cfg)
    state = trainer.train(max_steps=2)
    assert int(state.step) == 2
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_mosaic_samples_not_double_augmented(tmp_path):
    """Mosaic samples arrive fully augmented from the host (the reference
    applies nothing after mosaic+HSV); under device_aug the trainer must
    neutralise the on-chip affine/HSV for them — images pass through
    unchanged (just normalised) and boxes keep their host values."""
    from tpucv.builder import export_from_registry
    cfg, _, trainer_cls = export_from_registry("yolo8_det")
    cfg.dataset.input_size = 96
    cfg.dataset.max_num_boxes = 8
    cfg.train.batch_size = 4
    cfg.train.device_aug = True
    cfg.train.mosaic_prob = 1.0            # every sample host-mosaic'd
    cfg.train.mixed_precision = False
    cfg.log.tensorboard_on = False
    cfg.train.save_path = str(tmp_path / "saves")
    cfg.log.root = str(tmp_path / "log")
    trainer = trainer_cls(cfg)
    batch = next(iter(trainer.train_loader))
    assert batch["host_aug"].all()
    out = trainer.device_batch(dict(batch), train=True)
    np.testing.assert_allclose(
        np.asarray(out["images"], np.float32),
        batch["images"].astype(np.float32) / 255.0, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out["gt_bboxes"]), batch["gt_bboxes"], atol=1e-3)

    # control: with mosaic off, the on-chip affine really does move things
    cfg.train.mosaic_prob = 0.0
    trainer2 = trainer_cls(cfg)
    b2 = next(iter(trainer2.train_loader))
    assert not b2["host_aug"].any()
    out2 = trainer2.device_batch(dict(b2), train=True)
    assert not np.allclose(
        np.asarray(out2["images"], np.float32),
        b2["images"].astype(np.float32) / 255.0, atol=2e-3)


def test_device_batch_aug_keys_consumed(tmp_path):
    from tpucv.builder import export_from_registry
    cfg, _, trainer_cls = export_from_registry("yolo8_det")
    cfg.dataset.input_size = 96
    cfg.dataset.max_num_boxes = 8
    cfg.train.batch_size = 8
    cfg.train.device_aug = True
    cfg.train.mixed_precision = False
    cfg.log.tensorboard_on = False
    cfg.train.save_path = str(tmp_path / "saves")
    cfg.log.root = str(tmp_path / "log")
    trainer = trainer_cls(cfg)
    batch = next(iter(trainer.train_loader))
    out = trainer.device_batch(batch, train=True)
    assert "aug_scale" not in out          # consumed on device
    assert out["images"].dtype.name in ("float32", "bfloat16")
    assert float(np.asarray(out["images"]).max()) <= 1.0 + 1e-5
    # eval path unaffected
    out_eval = trainer.device_batch(batch, train=False)
    assert out_eval["gt_bboxes"].shape == batch["gt_bboxes"].shape
