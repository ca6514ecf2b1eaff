"""End-to-end smoke tests: registry round-trip, synthetic-data training steps,
predict path, eval harness — the system-level coverage the reference never had
(SURVEY.md §4)."""

import os

import numpy as np
import pytest


pytestmark = pytest.mark.slow  # heavy: full-model compiles

def _small_cfg():
    from tpucv.builder import export_from_registry
    cfg, algo_cls, trainer_cls = export_from_registry("yolo8_det")
    cfg.dataset.input_size = 96
    cfg.dataset.max_num_boxes = 8
    cfg.train.batch_size = 8
    cfg.train.epochs = 1
    cfg.train.eval_interval = 1
    cfg.train.save_interval = 1000
    cfg.log.print_interval = 1
    cfg.log.tensorboard_on = False
    cfg.train.mixed_precision = False
    cfg.decode.pre_nms_topk = 256
    cfg.decode.max_det = 20
    return cfg, algo_cls, trainer_cls


def test_registry_roundtrip():
    from tpucv.builder import export_from_registry
    from tpucv.check import MODELS
    cfg, algo_cls, trainer_cls = export_from_registry("yolo8_det")
    assert cfg.model_name == "yolo8_det"
    with pytest.raises(ValueError):
        export_from_registry("nope")
    assert "yolo8_det" in MODELS


def test_train_smoke_and_checkpoint(tmp_path):
    cfg, _, trainer_cls = _small_cfg()
    cfg.train.save_path = str(tmp_path / "saves")
    cfg.log.root = str(tmp_path / "log")
    trainer = trainer_cls(cfg)
    state = trainer.train(max_steps=2)
    assert int(state.step) == 2
    # checkpoint roundtrip
    from tpucv.ckpt.checkpoint import CheckPoint
    files = os.listdir(cfg.train.save_path)
    assert any(f.endswith(".ckpt") for f in files)
    path = os.path.join(cfg.train.save_path, sorted(files)[-1])
    restored = CheckPoint.load(path, state)
    assert int(restored.step) == int(state.step)
    np.testing.assert_allclose(
        np.asarray(restored.params["b0"]["conv"]["kernel"]),
        np.asarray(state.params["b0"]["conv"]["kernel"]))


def test_predict_on_synthetic_image(tmp_path):
    import cv2
    cfg, algo_cls, _ = _small_cfg()
    algo = algo_cls(cfg)
    model = algo.build_model()
    variables = algo.init_variables(model)
    img = np.random.default_rng(0).integers(
        0, 255, (120, 160, 3), dtype=np.uint8)
    p = str(tmp_path / "img.jpg")
    cv2.imwrite(p, img)
    res = algo.predict(variables, p, save_dir=str(tmp_path))
    assert res["boxes"].shape[1] == 4
    assert res["saved"] and os.path.isfile(res["saved"])


def test_voc_eval_harness_synthetic():
    """The eval pipeline runs end-to-end on synthetic data and produces a
    bounded mAP."""
    from tpucv.data.detection_dataset import SyntheticDetectionIndex
    cfg, algo_cls, _ = _small_cfg()
    cfg.dataset.name = "voc"
    algo = algo_cls(cfg)
    variables = algo.init_variables()
    index = SyntheticDetectionIndex(4, cfg.dataset.input_size, 20, seed=3)
    res = algo.evaluate_on_voc(variables, index, batch_size=4,
                               conf_threshold=0.01)
    assert 0.0 <= res["mAP"] <= 1.0


def test_dataset_root_env_override(monkeypatch):
    from tpucv.configs.dataset_cfg import get_dataset_cfg
    monkeypatch.setenv("TPUCV_COCO_ROOT", "/custom/coco")
    assert get_dataset_cfg("coco")["root"] == "/custom/coco"
    monkeypatch.delenv("TPUCV_COCO_ROOT")
    assert get_dataset_cfg("coco")["root"] != "/custom/coco"
    # voc unaffected
    assert "VOC" in get_dataset_cfg("voc")["root"]


def test_voc_eval_writes_plots(tmp_path):
    """--plots wiring (VERDICT r3 missing #3): evaluate_on_voc(plots=True)
    writes the reference's eval-time AP/PR artifacts (mAP.py:208-300)."""
    from tpucv.data.detection_dataset import SyntheticDetectionIndex
    cfg, algo_cls, _ = _small_cfg()
    cfg.dataset.name = "voc"
    algo = algo_cls(cfg)
    variables = algo.init_variables()
    index = SyntheticDetectionIndex(4, cfg.dataset.input_size, 20, seed=3)
    plot_dir = tmp_path / "plots"
    res = algo.run_eval(variables, index, batch_size=4, plots=True,
                        plot_dir=str(plot_dir))
    assert 0.0 <= res["mAP"] <= 1.0
    assert (plot_dir / "mAP.png").is_file()
    assert (plot_dir / "pr_curves.png").is_file()


def test_build_eval_index_synthetic_fallbacks(monkeypatch):
    """Each algorithm family constructs its own eval index (the CLI is
    family-agnostic, VERDICT r3 weak #5); without dataset roots every
    family falls back to announced synthetic data."""
    from tpucv.builder import export_from_registry
    monkeypatch.delenv("TPUCV_CLS_ROOT", raising=False)
    for name, n_expected in [("deeplabv3plus", 8), ("yolo8_pose", 16),
                             ("vit_cls", 32)]:
        cfg, algo_cls, _ = export_from_registry(name)
        algo = algo_cls(cfg)
        index = algo.build_eval_index("val")
        assert len(index) == n_expected, name
        assert callable(getattr(algo, "run_eval"))
