"""Golden DECODE parity: identical raw head outputs through the reference
torch decode paths vs the tpucv jitted decoders — the stage between golden
forward parity (test_golden_{ssd,centernet,yolov7}) and final boxes.

Reference paths exercised verbatim (torchvision.ops.nms stubbed with a real
greedy torch NMS, everything else reference code):
  * SSD:       core/algorithms/ssd.py:236-325  (softmax, variance decode,
               per-class multilabel NMS, h=w=input so letterbox is identity)
  * CenterNet: core/algorithms/centernet.py:271-338 (sigmoid, 3x3 peak
               suppression, top-K, gather, DIoU NMS)
  * YOLOv7:    core/algorithms/yolo_v7.py:234-422 (sigmoid*2-0.5 grid decode,
               argmax-class NMS with obj*cls scores)
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "core")),
    reason="reference checkout not available")]


def _greedy_torch_nms():
    import torch

    def nms(boxes, scores, iou_threshold):
        order = scores.argsort(descending=True)
        keep = []
        while order.numel() > 0:
            i = order[0]
            keep.append(int(i))
            if order.numel() == 1:
                break
            rest = order[1:]
            x1 = torch.maximum(boxes[i, 0], boxes[rest, 0])
            y1 = torch.maximum(boxes[i, 1], boxes[rest, 1])
            x2 = torch.minimum(boxes[i, 2], boxes[rest, 2])
            y2 = torch.minimum(boxes[i, 3], boxes[rest, 3])
            inter = (x2 - x1).clamp(0) * (y2 - y1).clamp(0)
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = ((boxes[rest, 2] - boxes[rest, 0])
                  * (boxes[rest, 3] - boxes[rest, 1]))
            iou = inter / (a1 + a2 - inter + 1e-12)
            order = rest[iou <= iou_threshold]
        return torch.as_tensor(keep, dtype=torch.long)

    return nms


@pytest.fixture(scope="module", autouse=True)
def ref_env():
    from test_golden_losses import install_reference_stubs
    install_reference_stubs()
    sys.modules["torchvision.ops"].nms = _greedy_torch_nms()
    yield


def _as_set(boxes, scores, classes, tol=0.5):
    """Detection set as sortable tuples (coarse coords, exact class)."""
    out = []
    for b, s, c in zip(boxes, scores, classes):
        out.append((int(c), round(float(b[0]) / tol), round(float(b[1]) / tol),
                    round(float(b[2]) / tol), round(float(b[3]) / tol)))
    return sorted(out)


def test_golden_ssd_decode():
    import torch
    from configs import SsdConfig
    from core.algorithms.ssd import Ssd

    import jax.numpy as jnp
    from tpucv.builder import export_from_registry
    from tpucv.decode.ssd import decode_ssd

    cfg = SsdConfig()
    algo = Ssd(cfg, torch.device("cpu"))
    A, nc = algo.num_anchors, algo.num_classes
    rng = np.random.default_rng(0)
    loc = (rng.standard_normal((1, A, 4)) * 0.5).astype(np.float32)
    conf = (rng.standard_normal((1, A, nc + 1)) * 1.5).astype(np.float32)

    res = algo.decode_boxes(
        (torch.from_numpy(loc), torch.from_numpy(conf)), 300, 300)[0]
    res = np.asarray(res).reshape(-1, 6)   # x1 y1 x2 y2 label conf

    my_cfg, my_algo_cls, _ = export_from_registry("ssd")
    priors = my_algo_cls(my_cfg).priors
    np.testing.assert_allclose(
        np.asarray(priors), algo.anchors, atol=1e-6)   # prior parity first
    jb, js, jc, jv = decode_ssd(
        jnp.asarray(loc), jnp.asarray(conf), priors, 300,
        conf_threshold=algo.conf_threshold,
        iou_threshold=algo.nms_threshold, max_det=400, pre_nms_topk=2048)
    jb, js, jc, jv = (np.asarray(v)[0] for v in (jb, js, jc, jv))

    got = _as_set(jb[jv], js[jv], jc[jv])
    want = _as_set(res[:, :4], res[:, 5], res[:, 4])
    assert got == want and len(want) > 0


def test_golden_centernet_decode():
    import torch
    from configs import CenternetConfig
    from core.algorithms.centernet import CenterNetA

    import jax.numpy as jnp
    from tpucv.decode.centernet import decode_centernet

    cfg = CenternetConfig()
    algo = CenterNetA(cfg, torch.device("cpu"))
    H, W = algo.feature_size
    nc = algo.num_classes
    rng = np.random.default_rng(1)
    # sparse heatmap: ~60 clear peaks on a cold background, so the top-K
    # cut sits in dead space — a dense random heatmap puts the K-boundary
    # on float-ULP ties where torch/jax sigmoid rounding picks different
    # 100th entries (verified: identical suppression masks, 1-entry top-K
    # boundary flip)
    hm_logits = rng.standard_normal((1, H, W, nc)).astype(np.float32) * 0.5 - 6
    flat = hm_logits.reshape(-1)
    peaks = rng.choice(flat.size, 60, replace=False)
    flat[peaks] = rng.standard_normal(60).astype(np.float32) * 1.5 + 2.0
    pred = np.concatenate([
        hm_logits,
        rng.random((1, H, W, 2), dtype=np.float32),           # reg offsets
        rng.random((1, H, W, 2), dtype=np.float32) * 12 + 2,  # wh (cells)
    ], axis=-1)

    in_h = algo.input_size[0]
    rb, rs, rc = algo.decode_boxes(torch.from_numpy(pred), in_h, in_h)

    jb, js, jc, jv = decode_centernet(
        jnp.asarray(pred), num_classes=nc,
        downsample=algo.downsampling_ratio, K=algo.K,
        conf_threshold=algo.conf_threshold,
        use_diou_nms=algo.use_nms, iou_threshold=algo.nms_threshold)
    jb, js, jc, jv = (np.asarray(v)[0] for v in (jb, js, jc, jv))

    got = _as_set(jb[jv], js[jv], jc[jv])
    want = _as_set(np.asarray(rb), np.asarray(rs), np.asarray(rc))
    assert got == want and len(want) > 0


def test_golden_yolov7_decode():
    import torch
    from configs import Yolo7Config
    from core.algorithms.yolo_v7 import YOLOv7 as YoloV7

    import jax.numpy as jnp
    from tpucv.builder import export_from_registry
    from tpucv.decode.yolov7 import decode_yolov7

    cfg = Yolo7Config()
    algo = YoloV7(cfg, torch.device("cpu"))
    nc = algo.num_classes
    S = 160                               # small grids keep the test quick
    strides = (8, 16, 32)
    rng = np.random.default_rng(2)
    raw_nhwc = [rng.standard_normal(
        (1, S // s, S // s, 3 * (5 + nc))).astype(np.float32) * 2
        for s in strides]
    algo.input_image_size = [S, S]
    # reference expects NCHW (na*attrs channels), stride-32 level FIRST
    raw_torch = [torch.from_numpy(
        m.reshape(1, S // s, S // s, 3, 5 + nc)
         .transpose(0, 3, 4, 1, 2).reshape(1, 3 * (5 + nc), S // s, S // s)
         .copy())
        for m, s in reversed(list(zip(raw_nhwc, strides)))]

    res = algo.decode_box(raw_torch, S, S, conf_threshold=0.9)[0]
    res = np.asarray(res).reshape(-1, 7)   # x1 y1 x2 y2 obj cls_conf label

    my_cfg, my_algo_cls, _ = export_from_registry("yolo7")
    mine = my_algo_cls(my_cfg)
    jb, js, jc, jv = decode_yolov7(
        [jnp.asarray(m) for m in raw_nhwc],
        mine.anchors, mine.strides, nc,
        conf_threshold=0.9,
        iou_threshold=algo.nms_threshold, max_det=300, pre_nms_topk=1024)
    jb, js, jc, jv = (np.asarray(v)[0] for v in (jb, js, jc, jv))

    got = _as_set(jb[jv], js[jv], jc[jv])
    want = _as_set(res[:, :4], res[:, 4] * res[:, 5], res[:, 6])
    assert got == want and len(want) > 0


def test_golden_yolov3_decode():
    """Legacy YOLOv3 path: reference core/predict/yolov3_decode.py Decoder
    (normalised sigmoid-xy/exp-wh grid decode + per-class multilabel NMS,
    yolo3_nms) vs tpucv decode_yolov3 on identical raw maps."""
    import torch
    from configs.yolov3_cfg import Config as Yolo3RefCfg
    from core.predict.yolov3_decode import Decoder

    import jax.numpy as jnp
    from tpucv.configs.model_cfgs import YOLO3_ANCHORS
    from tpucv.decode.yolov3 import decode_yolov3

    cfg = Yolo3RefCfg()
    nc = cfg.arch.num_classes
    S = cfg.arch.input_size[1]            # 416
    strides = (32, 16, 8)
    rng = np.random.default_rng(3)
    raw_nhwc = [rng.standard_normal(
        (1, S // s, S // s, 3 * (5 + nc))).astype(np.float32) * 1.5
        for s in strides]
    raw_torch = [torch.from_numpy(
        m.transpose(0, 3, 1, 2).copy()) for m in raw_nhwc]

    dec = Decoder(cfg, conf_threshold=0.93, device=torch.device("cpu"))
    rb, rs, rc = dec(raw_torch)
    rb = np.asarray(rb) * S               # reference boxes are normalised

    anchors = np.asarray(YOLO3_ANCHORS, np.float32)
    jb, js, jc, jv = decode_yolov3(
        [jnp.asarray(m) for m in raw_nhwc], anchors,
        ((6, 7, 8), (3, 4, 5), (0, 1, 2)), strides, nc,
        conf_threshold=0.93, iou_threshold=cfg.decode.iou_threshold,
        max_det=400, pre_nms_topk=4096)
    jb, js, jc, jv = (np.asarray(v)[0] for v in (jb, js, jc, jv))

    got = _as_set(jb[jv], js[jv], jc[jv])
    want = _as_set(rb, np.asarray(rs), np.asarray(rc))
    assert got == want and len(want) > 0
