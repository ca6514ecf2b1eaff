"""YOLOv8-seg family: model head, loss, decode, dataset, trainer smoke.
(No reference counterpart — the torch repo has no instance-seg task.)"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_cfg():
    from tpucv.builder import export_from_registry
    cfg, algo_cls, trainer_cls = export_from_registry("yolo8_seg")
    cfg.dataset.input_size = 64
    cfg.dataset.max_num_boxes = 4
    cfg.train.batch_size = 2
    cfg.train.epochs = 1
    cfg.train.eval_interval = 1000
    cfg.train.save_interval = 1000
    cfg.log.print_interval = 1
    cfg.log.tensorboard_on = False
    cfg.train.mixed_precision = False
    cfg.decode.pre_nms_topk = 64
    cfg.decode.max_det = 10
    cfg.loss.mask_topk = 8
    return cfg, algo_cls, trainer_cls


def test_segment_model_forward_shapes():
    from tpucv.models.yolov8 import Yolo8
    m = Yolo8(scale="n", nc=5, head="segment", n_masks=8)
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    det, coefs, protos = m.apply(v, x)
    assert det[0].shape == (1, 8, 8, 64 + 5)
    assert coefs[0].shape == (1, 8, 8, 8)
    assert protos.shape == (1, 16, 16, 8)


def test_seg_loss_prefers_correct_masks():
    """mask_loss must be lower when coefficients reconstruct the GT mask
    than when they reconstruct its complement."""
    from tpucv.losses.yolov8_seg import yolov8_seg_loss

    B, nc, rm, nm = 1, 5, 16, 4
    key = jax.random.PRNGKey(0)
    det_maps = [jax.random.normal(key, (B, s, s, 4 * rm + nc)) * 0.1
                for s in (8, 4, 2)]
    protos = jnp.zeros((B, 16, 16, nm)).at[..., 0].set(8.0)  # proto0 ~ "on"
    gt_boxes = jnp.asarray([[[8.0, 8.0, 40.0, 40.0]]])       # px (64 input)
    gt_labels = jnp.asarray([[1]], jnp.int32)
    gt_valid = jnp.asarray([[True]])
    gm = np.zeros((B, 1, 16, 16), np.float32)
    gm[:, :, 2:10, 2:10] = 1.0                               # mask == box/4
    good = [jnp.zeros((B, s, s, nm)).at[..., 0].set(1.0) for s in (8, 4, 2)]
    bad = [jnp.zeros((B, s, s, nm)).at[..., 0].set(-1.0) for s in (8, 4, 2)]

    def run(coef_maps):
        _, m = yolov8_seg_loss(
            (det_maps, coef_maps, protos), gt_labels, gt_boxes, gt_valid,
            jnp.asarray(gm), nc=nc, reg_max=rm, mask_topk=8)
        return float(m["mask_loss"])

    assert run(good) < run(bad)


def test_decode_seg_returns_coefs_and_protos():
    from tpucv.decode.yolov8_seg import decode_seg
    B, nc, rm, nm = 2, 5, 16, 4
    rng = np.random.default_rng(0)
    det_maps = [jnp.asarray(rng.normal(size=(B, s, s, 4 * rm + nc))
                            .astype(np.float32)) for s in (8, 4, 2)]
    coef_maps = [jnp.asarray(rng.normal(size=(B, s, s, nm))
                             .astype(np.float32)) for s in (8, 4, 2)]
    protos = jnp.asarray(rng.normal(size=(B, 16, 16, nm)).astype(np.float32))
    out = decode_seg((det_maps, coef_maps, protos), nc=nc, reg_max=rm,
                     conf_threshold=0.01, max_det=6, pre_nms_topk=32)
    boxes, scores, classes, valid, coefs, pr = out
    assert boxes.shape == (B, 6, 4) and coefs.shape == (B, 6, nm)
    assert pr.shape == protos.shape
    # the kept coefficients must be actual rows of the flat coef table
    flat = np.concatenate([np.asarray(c).reshape(B, -1, nm)
                           for c in coef_maps], 1)
    c0 = np.asarray(coefs)[0, 0]
    assert any(np.allclose(c0, row, atol=1e-6) for row in flat[0])


def test_instance_seg_dataset_masks_match_boxes():
    from tpucv.data.detection_dataset import SyntheticDetectionIndex
    from tpucv.data.instance_seg_dataset import (
        InstanceSegDataset, instance_seg_collate)

    idx = SyntheticDetectionIndex(4, 64, 5, seed=0)
    ds = InstanceSegDataset(idx, 64, 4)
    item = ds[0]
    assert item["images"].shape == (64, 64, 3)
    assert item["gt_inst_masks"].shape == (4, 16, 16)
    for j in range(int(item["gt_mask"].sum())):
        x1, y1, x2, y2 = item["gt_bboxes"][j] / 4
        m = item["gt_inst_masks"][j]
        assert m.sum() > 0
        ys, xs = np.nonzero(m)
        assert xs.min() >= int(x1) and xs.max() <= int(np.ceil(x2))
        assert ys.min() >= int(y1) and ys.max() <= int(np.ceil(y2))
    batch = instance_seg_collate([ds[0], ds[1]])
    assert batch["gt_inst_masks"].shape == (2, 4, 16, 16)


def test_coco_polygon_rasterization(tmp_path):
    import json
    from tpucv.data.coco import COCOIndex
    from tpucv.data.instance_seg_dataset import InstanceSegDataset

    js = {
        "images": [{"id": 1, "file_name": "x.jpg", "height": 64, "width": 64}],
        "annotations": [{
            "id": 1, "image_id": 1, "category_id": 1,
            "bbox": [8.0, 8.0, 32.0, 32.0], "area": 1024.0, "iscrowd": 0,
            "segmentation": [[8, 8, 40, 8, 40, 40, 8, 40]],  # square poly
        }],
        "categories": [{"id": 1, "name": "thing"}],
    }
    (tmp_path / "ann.json").write_text(json.dumps(js))
    import cv2
    cv2.imwrite(str(tmp_path / "x.jpg"), np.zeros((64, 64, 3), np.uint8))
    index = COCOIndex(str(tmp_path / "ann.json"), str(tmp_path),
                      keep_polys=True)
    assert index.polygons(0, 0) is not None
    ds = InstanceSegDataset(index, 64, 4)
    m = ds[0]["gt_inst_masks"][0]
    # polygon 8..40 px -> 2..10 at mask scale
    assert m[5, 5] == 1 and m[1, 1] == 0 and m[12, 12] == 0


@pytest.mark.slow
def test_seg_one_train_step(tmp_path):
    cfg, _, trainer_cls = _tiny_cfg()
    cfg.train.save_path = str(tmp_path / "saves")
    cfg.log.root = str(tmp_path / "log")
    trainer = trainer_cls(cfg)
    state = trainer.train(max_steps=1)
    assert int(state.step) == 1
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


@pytest.mark.slow
def test_seg_predict_returns_masks(tmp_path):
    cfg, algo_cls, _ = _tiny_cfg()
    algo = algo_cls(cfg)
    variables = algo.init_variables()
    img = np.random.default_rng(0).integers(
        0, 255, (80, 60, 3), dtype=np.uint8)
    res = algo.predict(variables, img, save_dir=str(tmp_path))
    assert "masks" in res
    assert res["masks"].shape[1:] == img.shape[:2] or len(res["masks"]) == 0


@pytest.mark.slow
def test_seg_predict_with_cli_infer_fn(tmp_path):
    """Regression: predict.py prebuilds algo.make_predict_infer_fn —
    for seg that must be the mask-coefficient contract, not the
    boxes-only eval fn."""
    cfg, algo_cls, _ = _tiny_cfg()
    algo = algo_cls(cfg)
    model = algo.build_model()
    variables = algo.init_variables(model)
    infer_fn = algo.make_predict_infer_fn(model)
    img = np.random.default_rng(1).integers(
        0, 255, (80, 60, 3), dtype=np.uint8)
    res = algo.predict(variables, img, infer_fn=infer_fn,
                       save_dir=str(tmp_path))
    assert "masks" in res

# ------------------------------------------------------ mask AP (COCOMaskAP)

def _rect_mask(s, x1, y1, x2, y2):
    m = np.zeros((s, s), bool)
    m[y1:y2, x1:x2] = True
    return m


def test_coco_mask_ap_perfect():
    from tpucv.metrics.coco_map import COCOMaskAP

    gts, dts = [], []
    for i, (x1, y1, x2, y2) in enumerate([(2, 2, 40, 40), (10, 30, 60, 62)]):
        m = _rect_mask(64, x1, y1, x2, y2)
        gts.append({"image_id": i, "category_id": 0, "mask": m,
                    "area": float(m.sum()), "iscrowd": 0})
        dts.append({"image_id": i, "category_id": 0, "mask": m,
                    "score": 0.9})
    stats = COCOMaskAP(gts, dts, [0]).accumulate().summarize()
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AP75"] == pytest.approx(1.0)


def test_coco_mask_ap_discriminates_iou_levels():
    """A det mask covering exactly half its GT has mask IoU 0.5: TP at the
    0.5 threshold only -> AP = 1/10, AP50 = 1, AP75 = 0. Proves the engine
    measures MASK overlap, not the boxes (the boxes of the two masks here
    would have IoU 0.5 too, but a box engine can't see the mask at all)."""
    from tpucv.metrics.coco_map import COCOMaskAP

    g = _rect_mask(64, 0, 0, 40, 20)
    d = _rect_mask(64, 0, 0, 20, 20)      # left half: IoU exactly 0.5
    gts = [{"image_id": 0, "category_id": 0, "mask": g,
            "area": float(g.sum()), "iscrowd": 0}]
    dts = [{"image_id": 0, "category_id": 0, "mask": d, "score": 0.9}]
    stats = COCOMaskAP(gts, dts, [0]).accumulate().summarize()
    assert stats["AP50"] == pytest.approx(1.0)
    assert stats["AP"] == pytest.approx(0.1, abs=1e-6)
    assert stats["AP75"] == pytest.approx(0.0)


def test_coco_mask_ap_crowd_is_ignore():
    """A high-scoring det on a crowd mask is neither TP nor FP."""
    from tpucv.metrics.coco_map import COCOMaskAP

    real = _rect_mask(64, 2, 2, 20, 20)
    crowd = _rect_mask(64, 30, 30, 62, 62)
    det_on_crowd = _rect_mask(64, 34, 34, 50, 50)   # inside crowd: crowd
    # IoU = inter/d_area = 1.0
    gts = [
        {"image_id": 0, "category_id": 0, "mask": real,
         "area": float(real.sum()), "iscrowd": 0},
        {"image_id": 0, "category_id": 0, "mask": crowd,
         "area": float(crowd.sum()), "iscrowd": 1},
    ]
    dts = [
        {"image_id": 0, "category_id": 0, "mask": det_on_crowd,
         "score": 0.95},
        {"image_id": 0, "category_id": 0, "mask": real, "score": 0.9},
    ]
    stats = COCOMaskAP(gts, dts, [0]).accumulate().summarize()
    assert stats["AP"] == pytest.approx(1.0)


@pytest.mark.slow
def test_evaluate_mask_ap_runs_end_to_end():
    """Untrained weights: the mask-AP harness must run the full prototype
    pipeline and produce a finite summary (signal comes from the frozen
    anchor, tests/test_frozen_eval.py)."""
    from tpucv.data.detection_dataset import SyntheticDetectionIndex

    cfg, algo_cls, _ = _tiny_cfg()
    algo = algo_cls(cfg)
    variables = algo.init_variables()
    idx = SyntheticDetectionIndex(3, 64, len(algo.class_names),
                                  max_objects=2, seed=0)
    stats = algo.evaluate_mask_ap(variables, idx, batch_size=2,
                                  conf_threshold=0.01, verbose=False)
    assert set(stats) >= {"AP", "AP50", "AP75"}
    assert all(np.isfinite(v) for v in stats.values())
