"""Golden *value* parity: reference torch losses vs tpucv losses.

Feeds byte-identical synthetic batches to the reference loss implementations
(read-only from /root/reference: core/algorithms/yolo_v8.py Loss,
core/loss/multi_box_loss.py MultiBoxLossV2, core/loss/centernet_loss.py
CombinedLoss, core/loss/focal_loss.py FocalLoss) and to the tpucv
re-implementations, and requires the loss values to agree within fp
tolerance. This is the only way to catch assigner/normalisation drift
without real datasets (VERDICT round 1, item 4b).

Skipped when the reference checkout is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "core")),
    reason="reference checkout not available")


def install_reference_stubs():
    """Make /root/reference importable: its modules import torchvision/thop/
    pycocotools at module level; none are used by the loss code paths, so
    satisfy them with stubs."""
    for name in ("thop", "torchvision", "torchvision.ops",
                 "torchvision.transforms", "torchvision.transforms.functional",
                 "torchvision.models"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = []  # mark as package so submodule imports resolve
            sys.modules[name] = mod
            if "." in name:
                parent, child = name.rsplit(".", 1)
                setattr(sys.modules[parent], child, mod)
    sys.modules["torchvision.ops"].nms = lambda *a, **k: None
    sys.modules["torchvision.ops"].batched_nms = lambda *a, **k: None

    def _to_tensor(img):
        # torchvision F.to_tensor semantics: HWC uint8 -> CHW float / 255
        import torch
        arr = np.asarray(img)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        return torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))

    sys.modules["torchvision.transforms.functional"].to_tensor = _to_tensor
    class _FakeWeights:
        class IMAGENET1K_V2:
            url = ""
        IMAGENET1K_V1 = IMAGENET1K_V2
    sys.modules["torchvision.models"].ResNet50_Weights = _FakeWeights
    sys.modules["torchvision.models"].ResNet101_Weights = _FakeWeights
    sys.modules["torchvision.models"].VGG16_BN_Weights = _FakeWeights
    if "pycocotools" not in sys.modules:
        pkg = types.ModuleType("pycocotools")
        coco = types.ModuleType("pycocotools.coco")
        coco.COCO = object
        cocoeval = types.ModuleType("pycocotools.cocoeval")
        cocoeval.COCOeval = object
        pkg.coco, pkg.cocoeval = coco, cocoeval
        sys.modules["pycocotools"] = pkg
        sys.modules["pycocotools.coco"] = coco
        sys.modules["pycocotools.cocoeval"] = cocoeval
    # APPEND, never insert(0): the reference checkout shares top-level module
    # names with the repo root (convert_model, train, registry, ...); putting
    # it first would shadow them for every later test in the same process
    # (ADVICE r2: 'import convert_model' in test_checkpointing picked up the
    # reference's torch version after any golden test ran).
    if REF not in sys.path:
        sys.path.append(REF)


@pytest.fixture(scope="module", autouse=True)
def ref_path():
    install_reference_stubs()
    yield


def test_multibox_v2_golden():
    import torch
    from core.loss.multi_box_loss import MultiBoxLossV2
    from tpucv.losses.multibox import multibox_loss

    rng = np.random.default_rng(0)
    B, A, nc = 3, 120, 20  # nc foreground classes; softmax over nc+1
    loc_pred = rng.normal(size=(B, A, 4)).astype(np.float32)
    conf_pred = rng.normal(size=(B, A, nc + 1)).astype(np.float32)
    loc_true = rng.normal(size=(B, A, 4)).astype(np.float32)
    pos = rng.random((B, A)) < 0.06
    pos[1] = False                       # one image with zero positives
    cls_true = np.where(pos, rng.integers(1, nc + 1, size=(B, A)), 0)

    # reference y_true layout: (B, A, 4 + (nc+1 one-hot) + pos-indicator)
    onehot = np.eye(nc + 1, dtype=np.float32)[cls_true]
    y_true = np.concatenate(
        [loc_true, onehot, pos[..., None].astype(np.float32)], axis=-1)
    ref = MultiBoxLossV2(neg_pos_ratio=3, num_classes=nc)
    r_total, r_loc, r_conf = ref(
        torch.from_numpy(y_true),
        (torch.from_numpy(loc_pred), torch.from_numpy(conf_pred)))

    j_total, parts = multibox_loss(
        loc_pred, conf_pred, loc_true, cls_true.astype(np.int32), pos)
    np.testing.assert_allclose(float(j_total), float(r_total), rtol=1e-5)
    np.testing.assert_allclose(
        float(parts["loc_loss"]), float(r_loc), rtol=1e-5)
    np.testing.assert_allclose(
        float(parts["conf_loss"]), float(r_conf), rtol=1e-5)


def test_multibox_v2_golden_all_negative():
    """No positives anywhere -> the 100-hard-negatives fallback path."""
    import torch
    from core.loss.multi_box_loss import MultiBoxLossV2
    from tpucv.losses.multibox import multibox_loss

    rng = np.random.default_rng(1)
    B, A, nc = 2, 150, 20
    loc_pred = rng.normal(size=(B, A, 4)).astype(np.float32)
    conf_pred = rng.normal(size=(B, A, nc + 1)).astype(np.float32)
    loc_true = np.zeros((B, A, 4), np.float32)
    pos = np.zeros((B, A), bool)
    cls_true = np.zeros((B, A), np.int32)

    onehot = np.eye(nc + 1, dtype=np.float32)[cls_true]
    y_true = np.concatenate(
        [loc_true, onehot, pos[..., None].astype(np.float32)], axis=-1)
    ref = MultiBoxLossV2(neg_pos_ratio=3, num_classes=nc)
    r_total, _, _ = ref(
        torch.from_numpy(y_true),
        (torch.from_numpy(loc_pred), torch.from_numpy(conf_pred)))
    j_total, _ = multibox_loss(loc_pred, conf_pred, loc_true, cls_true, pos)
    np.testing.assert_allclose(float(j_total), float(r_total), rtol=1e-5)


def test_centernet_combined_golden():
    import torch
    from core.loss.centernet_loss import CombinedLoss
    from tpucv.losses.centernet import centernet_loss
    from tpucv.targets.centernet import CenterNetTargets

    rng = np.random.default_rng(2)
    B, H, W, C, M = 2, 24, 24, 5, 8
    # model raw output: hm logits + 2 + 2 extra channels
    out_logits = rng.normal(size=(B, H, W, C + 4)).astype(np.float32)

    # targets: a few exact-1 peaks with gaussian surroundings
    hm = np.clip(rng.random((B, H, W, C)).astype(np.float32) * 0.6, 0, 0.999)
    mask = np.zeros((B, M), bool)
    ind = np.zeros((B, M), np.int64)
    reg_t = np.zeros((B, M, 2), np.float32)
    wh_t = np.zeros((B, M, 2), np.float32)
    for b in range(B):
        n = int(rng.integers(2, M))
        for i in range(n):
            y, x, c = rng.integers(0, H), rng.integers(0, W), rng.integers(0, C)
            hm[b, y, x, c] = 1.0
            mask[b, i] = True
            ind[b, i] = y * W + x
            reg_t[b, i] = rng.random(2)
            wh_t[b, i] = rng.random(2) * 6

    # reference: y_pred (B,H,W,C+4), y_true tuple; clamp(sigmoid(hm))
    ref = CombinedLoss(num_classes=C, hm_weight=1.0, wh_weight=0.1,
                       off_weight=1.0)
    r_total = ref(
        torch.from_numpy(out_logits),
        (torch.from_numpy(hm), torch.from_numpy(reg_t), torch.from_numpy(wh_t),
         torch.from_numpy(mask.astype(np.float32)), torch.from_numpy(ind)))

    targets = CenterNetTargets(
        heatmap=hm, ind=ind.astype(np.int32), wh=wh_t, reg=reg_t, mask=mask)
    j_total, _ = centernet_loss(out_logits, targets, C,
                                hm_weight=1.0, wh_weight=0.1, off_weight=1.0)
    np.testing.assert_allclose(float(j_total), float(r_total), rtol=1e-5)


def test_seg_focal_golden():
    import torch
    from core.loss.focal_loss import FocalLoss
    from tpucv.losses.segmentation import focal_loss

    rng = np.random.default_rng(3)
    B, H, W, C = 2, 17, 19, 21
    logits = rng.normal(size=(B, H, W, C)).astype(np.float32) * 2
    labels = rng.integers(0, C, size=(B, H, W)).astype(np.int64)

    ref = FocalLoss(alpha=0.25, gamma=2)
    r = ref(torch.from_numpy(logits.transpose(0, 3, 1, 2)),
            torch.from_numpy(labels))
    j, _ = focal_loss(logits, labels.astype(np.int32), alpha=0.25, gamma=2.0)
    np.testing.assert_allclose(float(j), float(r), rtol=1e-5)


def test_seg_ce_golden():
    import torch
    from tpucv.losses.segmentation import cross_entropy_loss

    rng = np.random.default_rng(4)
    B, H, W, C = 2, 13, 11, 21
    logits = rng.normal(size=(B, H, W, C)).astype(np.float32) * 2
    labels = rng.integers(0, C, size=(B, H, W)).astype(np.int64)
    r = torch.nn.CrossEntropyLoss(reduction="mean")(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(labels))
    j, _ = cross_entropy_loss(logits, labels.astype(np.int32))
    np.testing.assert_allclose(float(j), float(r), rtol=1e-5)


@pytest.fixture(scope="module")
def ref_yolov8(ref_path):
    import torch
    from core.models.yolov8.yolo_v8 import get_yolo8_n

    torch.manual_seed(0)
    m = get_yolo8_n(nc=80)
    m.eval()
    return m


def test_yolov8_loss_golden(ref_yolov8):
    import torch
    from core.algorithms.yolo_v8 import Loss as RefLoss
    from configs import Yolo8DetConfig
    from tpucv.losses.yolov8 import yolov8_loss

    cfg = Yolo8DetConfig()
    ref_loss = RefLoss(cfg, ref_yolov8)

    rng = np.random.default_rng(5)
    B, nc, reg_max = 2, 80, 16
    no = 4 * reg_max + nc
    shapes = [(8, 8), (4, 4), (2, 2)]
    imgsz = 64  # 8 * stride0(8)
    feats = [rng.normal(size=(B, no, h, w)).astype(np.float32)
             for (h, w) in shapes]

    # GT: per-image boxes, normalized xywh for the reference batch dict
    M = 5
    gt_xyxy = np.zeros((B, M, 4), np.float32)
    gt_cls = np.zeros((B, M), np.int32)
    gt_mask = np.zeros((B, M), bool)
    entries = []
    for b in range(B):
        n = 3 if b == 0 else 2
        for i in range(n):
            x1, y1 = rng.random(2) * 30
            w, h = rng.random(2) * 25 + 6
            c = int(rng.integers(0, nc))
            gt_xyxy[b, i] = [x1, y1, x1 + w, y1 + h]
            gt_cls[b, i] = c
            gt_mask[b, i] = True
            cx, cy = (x1 + w / 2) / imgsz, (y1 + h / 2) / imgsz
            entries.append([b, c, cx, cy, w / imgsz, h / imgsz])
    entries = np.asarray(entries, np.float32)
    batch = {
        "batch_idx": torch.from_numpy(entries[:, 0]),
        "cls": torch.from_numpy(entries[:, 1:2]),
        "bboxes": torch.from_numpy(entries[:, 2:6]),
    }
    with torch.no_grad():
        r_total, r_parts = ref_loss(
            [torch.from_numpy(f) for f in feats], batch)

    raw_maps = [f.transpose(0, 2, 3, 1) for f in feats]  # NHWC
    j_total, j_parts = yolov8_loss(
        raw_maps, gt_cls, gt_xyxy, gt_mask, nc=nc, reg_max=reg_max,
        strides=(8, 16, 32), box_gain=cfg.loss.box, cls_gain=cfg.loss.cls,
        dfl_gain=cfg.loss.dfl)

    # reference returns gain-weighted components (box, cls, dfl)
    np.testing.assert_allclose(
        float(j_parts["box_loss"]) * cfg.loss.box, float(r_parts[0]),
        rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        float(j_parts["cls_loss"]) * cfg.loss.cls, float(r_parts[1]),
        rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        float(j_parts["dfl_loss"]) * cfg.loss.dfl, float(r_parts[2]),
        rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(j_total), float(r_total), rtol=1e-4)


def test_select_highest_overlaps_golden_multi_claim():
    """Multi-claim resolution parity with the reference
    (core/utils/bboxes.py:249-272): a multi-claim anchor's column is
    replaced by the one-hot of argmax over the RAW overlaps across ALL GT
    rows — which can reassign the anchor to a GT that never claimed it.
    Engineered so GT2 (a non-claimant) has the highest overlap at the
    contested anchor (code review r3 caught a masked-argmax shortcut that
    diverged exactly there)."""
    import torch
    from core.utils.bboxes import select_highest_overlaps as ref_sho
    from tpucv.losses.tal import select_highest_overlaps

    rng = np.random.default_rng(3)
    B, M, A = 2, 4, 12
    mask_pos = np.zeros((B, M, A), np.float32)
    # anchor 5 of image 0 claimed by GT0 and GT1; anchor 2 single-claim
    mask_pos[0, 0, 5] = 1
    mask_pos[0, 1, 5] = 1
    mask_pos[0, 2, 2] = 1
    # image 1: three-way claim on anchor 7
    mask_pos[1, 0, 7] = 1
    mask_pos[1, 1, 7] = 1
    mask_pos[1, 3, 7] = 1
    overlaps = rng.random((B, M, A)).astype(np.float32) * 0.5
    overlaps[0, 2, 5] = 0.9      # NON-claimant GT2 wins the raw argmax
    overlaps[1, 1, 7] = 0.95     # claimant GT1 wins

    r_idx, r_fg, r_mask = ref_sho(
        torch.from_numpy(mask_pos), torch.from_numpy(overlaps), M)
    j_idx, j_fg, j_mask = select_highest_overlaps(
        mask_pos, overlaps.astype(np.float32), M)

    np.testing.assert_array_equal(np.asarray(j_mask), r_mask.numpy())
    np.testing.assert_array_equal(
        np.asarray(j_fg).astype(np.float32), r_fg.numpy())
    np.testing.assert_array_equal(np.asarray(j_idx), r_idx.numpy())
    # the divergence case: anchor 5 went to the non-claimant GT2
    assert int(np.asarray(j_idx)[0, 5]) == 2
