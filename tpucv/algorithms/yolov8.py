"""YOLOv8 algorithm façade (reference ``core/algorithms/yolo_v8.py:127-381``):
model/loss factories, single-image predict, batched decode, VOC/COCO eval.

The reference evaluates one image per forward (yolo_v8.py:345-358); here eval
is batched and device-resident (see ``DetectionAlgorithm``).
"""

from __future__ import annotations

from typing import Optional

import jax

from tpucv.algorithms.base import DetectionAlgorithm
from tpucv.decode.yolov8 import decode_boxes
from tpucv.losses.yolov8 import yolov8_loss
from tpucv.models.yolov8 import Yolo8
from tpucv.ops.preprocess import normalize_images
from tpucv.registry import model_registry


def yolo_decode_args(cfg, nc: int, conf_threshold: Optional[float]) -> dict:
    """Shared decode-kwarg policy for the YOLOv8 family (det/seg/pose):
    predict-style confidences (0.25) gate candidates down to a few hundred,
    so cap k at 1024 and take the VMEM Pallas NMS; eval-style floods
    (conf=0.001) use the full cfg cap + scan NMS."""
    d = cfg.decode
    conf = d.conf_threshold if conf_threshold is None else conf_threshold
    topk = d.pre_nms_topk if conf < 0.01 else min(d.pre_nms_topk, 1024)
    return dict(nc=nc, reg_max=cfg.arch.reg_max, strides=cfg.arch.strides,
                conf_threshold=conf, iou_threshold=d.iou_threshold,
                max_det=d.max_det, pre_nms_topk=topk)


@model_registry("yolo8_det")
class YOLOv8(DetectionAlgorithm):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.nc = cfg.num_classes

    def build_model(self) -> Yolo8:
        return Yolo8(scale=self.cfg.arch.model_type, nc=self.nc,
                     reg_max=self.cfg.arch.reg_max, dtype=self.dtype)

    def build_loss(self):
        l, a = self.cfg.loss, self.cfg.arch

        def loss_fn(raw, batch):
            return yolov8_loss(
                raw, batch["gt_labels"], batch["gt_bboxes"], batch["gt_mask"],
                nc=self.nc, reg_max=a.reg_max, strides=a.strides,
                box_gain=l.box_gain, cls_gain=l.cls_gain, dfl_gain=l.dfl_gain,
                tal_topk=l.tal_topk)

        return loss_fn

    def make_infer_fn(self, model=None, conf_threshold: Optional[float] = None):
        model = model or self.build_model()
        kw = yolo_decode_args(self.cfg, self.nc, conf_threshold)

        @jax.jit
        def infer(variables, images_u8):
            x = normalize_images(images_u8, self.dtype)
            raw = model.apply(variables, x)
            return decode_boxes(raw, **kw)

        return infer
