"""YOLOv7 algorithm façade (reference ``core/algorithms/yolo_v7.py:26-422``)."""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax

from tpucv.algorithms.base import DetectionAlgorithm
from tpucv.decode.yolov7 import decode_yolov7
from tpucv.losses.yolov7 import yolov7_loss
from tpucv.models.yolov7 import Yolo7
from tpucv.ops.preprocess import normalize_images
from tpucv.registry import model_registry


@model_registry("yolo7")
class YOLOv7(DetectionAlgorithm):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.nc = cfg.num_classes
        a = cfg.arch
        flat = np.asarray(a.anchors, np.float32)
        self.anchors = np.stack(
            [flat[list(m)] for m in a.anchor_mask])    # (nl, na, 2)
        self.strides = a.strides

    def build_model(self) -> Yolo7:
        return Yolo7(nc=self.nc, na=self.anchors.shape[1],
                     phi=self.cfg.arch.phi, dtype=self.dtype)

    def build_loss(self):
        l = self.cfg.loss
        box_g, obj_g, cls_g = self.cfg.loss_gains()

        def loss_fn(raw, batch):
            return yolov7_loss(
                raw, batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
                anchors=self.anchors, strides=self.strides, nc=self.nc,
                box_gain=box_g, obj_gain=obj_g, cls_gain=cls_g,
                layer_balance=l.layer_balance)

        return loss_fn

    def make_infer_fn(self, model=None, conf_threshold: Optional[float] = None):
        model = model or self.build_model()
        d = self.cfg.decode
        conf = d.conf_threshold if conf_threshold is None else conf_threshold

        @jax.jit
        def infer(variables, images_u8):
            x = normalize_images(images_u8, self.dtype)
            raw = model.apply(variables, x)
            return decode_yolov7(
                raw, self.anchors, self.strides, self.nc,
                conf, d.iou_threshold, d.max_det, d.pre_nms_topk)

        return infer
