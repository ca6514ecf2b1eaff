"""Metric-level end-to-end parity: the reference's own published VOC number
vs tpucv's, on the same data (VERDICT r2 #2 — the last link of the quality
chain: golden forwards/decodes prove box parity; these prove the *final
published mAP* agrees).

Three layers:
  1. engine parity — identical detections/GTs through the reference's
     vendored Cartucho ``get_map`` (mAP.py:302-835) and tpucv's
     ``evaluate_voc_map`` must agree to float precision (incl. difficult
     ignore semantics and the legacy +1 pixel IoU convention);
  2. GT artifact parity — tpucv's txt export of a VOC index equals the GT
     txt files the reference's evaluate_on_voc writes from the same xml;
  3. full e2e — same random-init weights in the reference torch model and
     tpucv, both full evaluate_on_voc paths (JPEG -> forward -> decode ->
     NMS -> engine) on the same synthetic VOC, final mAP compared.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "core")),
    reason="reference checkout not available")]

VOC_N = 48  # synthetic images (12 in val: smoother AP quantization)


@pytest.fixture(scope="module", autouse=True)
def ref_path():
    from test_golden_pipeline import _torch_greedy_nms
    from test_golden_losses import install_reference_stubs
    install_reference_stubs()
    import torch
    tv_ops = sys.modules["torchvision.ops"]

    def batched_nms(boxes, scores, idxs, iou_threshold):
        off = boxes + idxs[:, None].to(boxes.dtype) * 7680.0
        return _torch_greedy_nms(off, scores, iou_threshold)

    tv_ops.nms = _torch_greedy_nms
    tv_ops.batched_nms = batched_nms
    if not hasattr(np, "int"):
        np.int = int
    yield


@pytest.fixture(scope="module")
def synthetic_voc(tmp_path_factory):
    root = tmp_path_factory.mktemp("synvoc")
    subprocess.run(
        [sys.executable, "scripts/make_synthetic_voc.py",
         "--root", str(root), "--n", str(VOC_N)],
        check=True, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    return str(root)


def _random_eval_set(rng, n_images=6, n_cls=5):
    """GTs with difficult flags + detections mixing near-hits and noise —
    enough near-threshold IoUs to exercise every matching branch."""
    from tpucv.configs.dataset_cfg import VOC_CLASSES
    names = VOC_CLASSES[:n_cls]
    gts, dts = [], []
    for i in range(n_images):
        for _ in range(int(rng.integers(1, 6))):
            x, y = rng.uniform(0, 400, 2)
            w, h = rng.uniform(30, 150, 2)
            c = int(rng.integers(0, n_cls))
            gts.append({"image_id": i, "class_id": c,
                        "bbox": [x, y, x + w, y + h],
                        "difficult": bool(rng.random() < 0.2)})
            # 0-3 detections around each GT at varied IoU + score
            for _ in range(int(rng.integers(0, 4))):
                j = rng.uniform(-0.4, 0.4, 4) * [w, h, w, h]
                dts.append({"image_id": i, "class_id": c,
                            "bbox": list(np.array([x, y, x + w, y + h]) + j),
                            "score": float(rng.uniform(0.05, 0.99))})
        for _ in range(int(rng.integers(0, 5))):   # pure noise
            x, y = rng.uniform(0, 400, 2)
            w, h = rng.uniform(20, 120, 2)
            dts.append({"image_id": i, "class_id": int(rng.integers(0, n_cls)),
                        "bbox": [x, y, x + w, y + h],
                        "score": float(rng.uniform(0.05, 0.99))})
    return names, gts, dts


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_engine_parity_reference_get_map(tmp_path, seed):
    """Same txt dirs -> reference get_map vs tpucv engine: equal mAP."""
    from core.metrics.mAP import get_map
    from tpucv.metrics.voc_map import evaluate_voc_map
    from tpucv.metrics.voc_txt import (
        export_detection_txt, export_ground_truth_txt,
        import_detection_txt, import_ground_truth_txt)

    rng = np.random.default_rng(seed)
    names, gts, dts = _random_eval_set(rng)

    root = tmp_path / f"map_out{seed}"
    keys = [f"{i:06d}" for i in range(6)]
    export_detection_txt(dts, names, str(root / "detection-results"), keys)

    class _GtIndex:       # minimal index view over the dict GTs
        def __len__(self):
            return 6

        def __getitem__(self, i):
            mine = [g for g in gts if g["image_id"] == i]
            return (f"{keys[i]}.jpg",
                    np.array([g["bbox"] for g in mine], np.float32),
                    np.array([g["class_id"] for g in mine], np.int32))

        def eval_record(self, i):
            mine = [g for g in gts if g["image_id"] == i]
            return (np.array([g["bbox"] for g in mine], np.float32),
                    np.array([g["class_id"] for g in mine], np.int32),
                    np.array([g["difficult"] for g in mine], bool))

    export_ground_truth_txt(_GtIndex(), str(root / "ground-truth"), names)

    ref_map = get_map(0.5, False, score_threshold=0.5, path=str(root))

    # both engines read the SAME txt artifacts (int-truncated coords)
    r_dts = import_detection_txt(str(root / "detection-results"), names)
    r_gts = import_ground_truth_txt(str(root / "ground-truth"), names)
    res = evaluate_voc_map(r_gts, r_dts, names, 0.5)
    assert res["mAP"] == pytest.approx(ref_map, abs=1e-9)


def test_gt_txt_matches_reference_writer(synthetic_voc, tmp_path):
    """tpucv's GT export == the files the reference's evaluate_on_voc writes
    from the same xml (yolo_v8.py:302-324) — byte-identical content."""
    import xml.etree.ElementTree as ET
    from tpucv.configs.dataset_cfg import VOC_CLASSES
    from tpucv.data.voc import VOCDetectionIndex
    from tpucv.metrics.voc_txt import export_ground_truth_txt, voc_image_keys

    index = VOCDetectionIndex(synthetic_voc, split="val")
    out = tmp_path / "gt"
    export_ground_truth_txt(index, str(out), VOC_CLASSES)

    for key in voc_image_keys(index):
        # replicate the reference writer verbatim
        ref_lines = []
        xml_root = ET.parse(os.path.join(
            synthetic_voc, "Annotations", f"{key}.xml")).getroot()
        for obj in xml_root.findall("object"):
            difficult_flag = (obj.find("difficult") is not None
                              and int(obj.find("difficult").text) == 1)
            name = obj.find("name").text
            if name not in VOC_CLASSES:
                continue
            bb = obj.find("bndbox")
            l, t = bb.find("xmin").text, bb.find("ymin").text
            r, b = bb.find("xmax").text, bb.find("ymax").text
            tail = " difficult" if difficult_flag else ""
            ref_lines.append(f"{name} {l} {t} {r} {b}{tail}\n")
        with open(out / f"{key}.txt") as f:
            assert f.readlines() == ref_lines


def test_full_e2e_published_map_parity(synthetic_voc, tmp_path, monkeypatch):
    """Same weights, both frameworks' complete evaluate_on_voc, same
    synthetic VOC -> the two published mAP@0.5 numbers agree.

    The weights are BRIEFLY TRAINED here with the reference's own Loss on
    the synthetic train split. This is load-bearing, not convenience
    (round-3 finding): at random init the BN running stats are (0, 1) and
    the input's influence decays below fp32 resolution through ~60
    eval-mode BN+SiLU layers — every image yields identical all-tied
    detections and the two 0.0 mAPs match vacuously. Calibrating BN stats
    alone restores signal but puts the random net in the chaotic regime,
    where torch-vs-XLA fp32 rounding (~1e-7/layer) amplifies exponentially
    and the two frameworks' detections legitimately decorrelate. Trained
    weights are contractive AND input-sensitive — the only regime where a
    cross-framework published-number comparison is well-posed.
    """
    import cv2
    import torch
    import core.algorithms.yolo_v8 as ref_algo_mod
    from configs import Yolo8DetConfig
    from core.algorithms.yolo_v8 import Loss as RefLoss
    from core.models.yolov8.yolo_v8 import get_yolo8_n

    from tpucv.builder import export_from_registry
    from tpucv.ckpt.importer import import_yolov8, merge_into_variables
    from tpucv.data.voc import VOCDetectionIndex

    S = 160          # train AND eval size (both frameworks)

    # ---- shared weights: torch yolo8n(nc=20) trained by the REFERENCE ----
    torch.manual_seed(7)
    tm = get_yolo8_n(nc=20)
    for m in tm.modules():
        if type(m).__name__ == "Detect":
            for seq in m.cv3:
                torch.nn.init.constant_(seq[-1].bias, -3.0)

    tr_index = VOCDetectionIndex(synthetic_voc, split="train")
    xs, metas = [], []
    for i in range(len(tr_index)):
        path, boxes, labels = tr_index[i]
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        xs.append(cv2.resize(img, (S, S)).astype(np.float32) / 255.0)
        b = np.asarray(boxes, np.float32)
        sx, sy = S / w, S / h
        cx = (b[:, 0] + b[:, 2]) / 2 * sx / S
        cy = (b[:, 1] + b[:, 3]) / 2 * sy / S
        bw = (b[:, 2] - b[:, 0]) * sx / S
        bh = (b[:, 3] - b[:, 1]) * sy / S
        metas.append((np.stack([cx, cy, bw, bh], 1),
                      np.asarray(labels, np.float32)))

    ref_loss_cfg = Yolo8DetConfig()
    ref_loss_cfg.dataset.num_classes = 20
    criterion = RefLoss(ref_loss_cfg, tm)
    opt = torch.optim.Adam(tm.parameters(), lr=2e-3)
    tm.train()
    n_train, B = len(xs), 4
    for step in range(600):
        sel = [(step * B + j) % n_train for j in range(B)]
        x = torch.from_numpy(
            np.stack([xs[i] for i in sel]).transpose(0, 3, 1, 2))
        bidx, cls, bb = [], [], []
        for j, i in enumerate(sel):
            boxes_n, labels = metas[i]
            bidx.extend([j] * len(labels))
            cls.extend(labels)
            bb.extend(boxes_n)
        batch = {"batch_idx": torch.tensor(bidx, dtype=torch.float32),
                 "cls": torch.tensor(cls, dtype=torch.float32)[:, None],
                 "bboxes": torch.tensor(np.asarray(bb, np.float32))}
        total, _ = criterion(tm(x), batch)
        opt.zero_grad()
        total.backward()
        opt.step()
    tm.eval()
    for mod in tm.modules():
        mod.training = False
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    cfg, algo_cls, _ = export_from_registry("yolo8_det")
    cfg.dataset.name = "voc"
    cfg.dataset.num_classes = 20
    cfg.dataset.input_size = S
    # the default pre_nms_topk (4096) exceeds 160^2's 525 anchors and
    # decode_boxes clamps to A, so every anchor floods into NMS like the
    # reference's max_nms=30000 (ultralytics_ops.py:166)
    algo = algo_cls(cfg)
    model = algo.build_model()
    variables = algo.init_variables(model)
    variables = merge_into_variables(
        {"params": dict(variables["params"]),
         "batch_stats": dict(variables["batch_stats"])}, import_yolov8(sd))

    # ---- reference path: its own evaluate_on_voc, mAP captured ----
    ref_cfg = Yolo8DetConfig()
    ref_cfg.dataset.num_classes = 20
    ref_cfg.dataset.dataset_name = "voc"
    ref_cfg.arch.input_size = (3, S, S)
    ref_algo_mod.VOC_CFG["root"] = synthetic_voc
    captured = {}
    real_get_map = ref_algo_mod.get_map

    def capture_get_map(minoverlap, draw_plot, score_threshold=0.5,
                        path="./map_out"):
        captured["map"] = real_get_map(minoverlap, False,
                                       score_threshold, path)
        return captured["map"]

    monkeypatch.setattr(ref_algo_mod, "get_map", capture_get_map)
    monkeypatch.setattr(ref_algo_mod, "get_coco_map",
                        lambda *a, **k: None)   # needs real pycocotools
    ref_algo = ref_algo_mod.YOLOv8(ref_cfg, torch.device("cpu"))
    with torch.no_grad():
        ref_algo.evaluate_on_voc(tm, str(tmp_path / "ref_out"), subset="val")
    ref_map = captured["map"]

    # ---- tpucv path: its own evaluate_on_voc on the same val split ----
    index = VOCDetectionIndex(synthetic_voc, split="val")
    res = algo.evaluate_on_voc(variables, index, batch_size=4,
                               conf_threshold=0.001, verbose=False)

    # anti-vacuous guard: the trained weights must actually detect —
    # 0.0 == 0.0 would prove nothing
    print(f"reference mAP@0.5={ref_map:.4f}  tpucv mAP@0.5={res['mAP']:.4f}")
    assert ref_map > 0.05, f"vacuous comparison: reference mAP={ref_map}"
    # measured agreement is ~2e-4 (round 3, after fixing the VOC class
    # ORDER to the reference's and matching its unclipped eval reverse
    # mapping); the tolerance covers the reference's int-truncated txt
    # coords + 4dp score rounding at this AP quantization
    assert res["mAP"] == pytest.approx(ref_map, abs=0.01)


def test_lamr_matches_reference_formula():
    """log_average_miss_rate == the reference's (mAP.py:34-71) for the same
    inputs — incl. the true-fp_cumsum FPPI (a detection matched to a
    difficult GT contributes neither tp nor fp; reconstructing fp from
    precision would inflate FPPI, code review r3)."""
    from core.metrics.mAP import log_average_miss_rate as ref_lamr
    from tpucv.metrics.voc_map import log_average_miss_rate

    rng = np.random.default_rng(0)
    for trial in range(5):
        n = int(rng.integers(1, 40))
        tp = (rng.random(n) < 0.5).astype(float)
        ignored = (rng.random(n) < 0.2) & (tp == 0)   # difficult matches
        fp = ((tp == 0) & ~ignored).astype(float)
        tp_c, fp_c = np.cumsum(tp), np.cumsum(fp)
        n_pos = max(int(tp.sum()) + int(rng.integers(0, 4)), 1)
        rec = tp_c / n_pos
        n_images = int(rng.integers(1, 10))
        r_lamr, r_mr, r_fppi = ref_lamr(np.array(rec), fp_c, n_images)
        j_lamr, j_mr, j_fppi = log_average_miss_rate(
            np.array(rec), fp_c, n_images)
        assert j_lamr == pytest.approx(float(r_lamr), abs=1e-12)
        np.testing.assert_allclose(j_mr, np.asarray(r_mr))
        np.testing.assert_allclose(j_fppi, np.asarray(r_fppi))
    # empty case
    assert log_average_miss_rate(np.array([]), np.array([]), 3) \
        == tuple(ref_lamr(np.array([]), np.array([]), 3))
