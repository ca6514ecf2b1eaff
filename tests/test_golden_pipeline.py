"""Full-pipeline golden parity at 640 on a REAL image (VERDICT round 1,
item 4a): letterbox -> forward -> decode -> NMS, tpucv vs the reference
torch path (core/algorithms/yolo_v8.py predict route), with the same
imported weights.

The torchvision.ops.batched_nms the reference calls is provided as a real
greedy torch implementation in the stub (torchvision itself is absent), so
the reference ``non_max_suppression`` (core/utils/ultralytics_ops.py:131)
runs verbatim.
"""

import glob
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "core")),
    reason="reference checkout not available")]

IMAGES = sorted(glob.glob(os.path.join(REF, "performance", "*.jpg")))


def _torch_greedy_nms(boxes, scores, iou_threshold):
    import torch
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


@pytest.fixture(scope="module", autouse=True)
def ref_path():
    import torch
    from test_golden_losses import install_reference_stubs
    install_reference_stubs()
    tv_ops = sys.modules["torchvision.ops"]

    def batched_nms(boxes, scores, idxs, iou_threshold):
        off = boxes + idxs[:, None].to(boxes.dtype) * 7680.0
        return _torch_greedy_nms(off, scores, iou_threshold)

    tv_ops.nms = _torch_greedy_nms
    tv_ops.batched_nms = batched_nms
    if not hasattr(np, "int"):          # reference uses removed np.int
        np.int = int
    yield


@pytest.fixture(scope="module")
def imported_pair():
    import torch
    import jax
    import jax.numpy as jnp
    from core.models.yolov8.yolo_v8 import get_yolo8_n
    from tpucv.ckpt.importer import import_yolov8, merge_into_variables
    from tpucv.models.yolov8 import Yolo8

    torch.manual_seed(3)
    tm = get_yolo8_n(nc=80)
    tm.eval()
    for mod in tm.modules():
        mod.training = False
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    model = Yolo8(scale="n", nc=80)
    init_vars = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    variables = merge_into_variables(
        {"params": dict(init_vars["params"]),
         "batch_stats": dict(init_vars["batch_stats"])}, import_yolov8(sd))
    return tm, model, variables


@pytest.mark.skipif(not IMAGES, reason="no sample images in reference")
def test_full_pipeline_golden_640(imported_pair):
    import torch
    import jax
    import jax.numpy as jnp
    from core.utils.ultralytics_ops import non_max_suppression
    from tpucv.decode.yolov8 import decode_boxes
    from tpucv.ops.preprocess import letterbox_images, normalize_images
    from tpucv.utils.image_process import read_image

    tm, model, variables = imported_pair
    img = read_image(IMAGES[0])
    h, w = img.shape[:2]
    C = 640
    canvas_raw = np.zeros((1, C, C, 3), np.uint8)
    canvas_raw[0, :h, :w] = img

    # tpucv: device letterbox (reference INTER_NEAREST semantics) + infer
    lb, scale, pad = letterbox_images(
        jnp.asarray(canvas_raw), jnp.asarray([[h, w]], np.int32), 640)
    raw = model.apply(variables, normalize_images(
        jnp.asarray(lb), jnp.float32))
    j_boxes, j_scores, j_cls, j_valid = jax.device_get(decode_boxes(
        raw, conf_threshold=0.25, iou_threshold=0.7, max_det=300))
    v = j_valid[0]
    j_boxes, j_scores, j_cls = j_boxes[0][v], j_scores[0][v], j_cls[0][v]

    # reference: the SAME letterboxed canvas -> torch forward -> ultralytics
    # non_max_suppression (torch greedy NMS), boxes in 640-canvas pixels
    x_t = torch.from_numpy(
        np.asarray(lb).astype(np.float32).transpose(0, 3, 1, 2) / 255.0)
    with torch.no_grad():
        y, _ = tm(x_t)
    preds = non_max_suppression(y, 0.25, 0.7, agnostic=False, max_det=300,
                                classes=None)
    t = preds[0].numpy()
    t_boxes, t_scores, t_cls = t[:, :4], t[:, 4], t[:, 5].astype(int)

    assert len(j_scores) == len(t_scores), (len(j_scores), len(t_scores))
    # same detections, order may differ among near-equal scores: greedy-match
    used = np.zeros(len(t_scores), bool)
    for b, s_, c in zip(j_boxes, j_scores, j_cls):
        best, best_iou = -1, 0.0
        for k in range(len(t_scores)):
            if used[k] or t_cls[k] != c:
                continue
            x1 = max(b[0], t_boxes[k, 0]); y1 = max(b[1], t_boxes[k, 1])
            x2 = min(b[2], t_boxes[k, 2]); y2 = min(b[3], t_boxes[k, 3])
            inter = max(0, x2 - x1) * max(0, y2 - y1)
            u = ((b[2] - b[0]) * (b[3] - b[1])
                 + (t_boxes[k, 2] - t_boxes[k, 0])
                 * (t_boxes[k, 3] - t_boxes[k, 1]) - inter)
            iou = inter / (u + 1e-12)
            if iou > best_iou:
                best, best_iou = k, iou
        assert best >= 0 and best_iou > 0.95, (b, c, best_iou)
        assert abs(s_ - t_scores[best]) < 1e-3, (s_, t_scores[best])
        used[best] = True
