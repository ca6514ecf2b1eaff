"""Legacy YOLOv3 trainer — intentionally NOT registered, mirroring the
reference's status (``core/trainer/yolov3_train.py:14-87`` exists but is
absent from check.MODELS / the registry)."""

from __future__ import annotations

import numpy as np

from tpucv.algorithms.base import DetectionAlgorithm
from tpucv.configs.model_cfgs import Yolo3Config
from tpucv.trainer.base import BaseTrainer
from tpucv.trainer.data_helpers import build_detection_loaders


class Yolo3Algorithm(DetectionAlgorithm):
    """Algorithm facade for the legacy path. Subclassing the shared base
    gives it the batched eval harnesses (evaluate_on_voc/evaluate_on_coco)
    and predict — the reference evaluates this path through
    ``evaluate_pipeline`` (core/metrics/eval.py:14-133); tpucv routes it
    through the standard device-resident harness instead."""

    def __init__(self, cfg: Yolo3Config):
        super().__init__(cfg)
        self.nc = cfg.num_classes
        self.anchors = np.asarray(cfg.arch.anchors, np.float32)
        self.anchor_mask = cfg.arch.anchor_mask
        self.strides = cfg.arch.strides

    def build_model(self):
        from tpucv.models.yolov3 import YoloV3
        return YoloV3(nc=self.nc, dtype=self.dtype)

    def build_loss(self):
        from tpucv.losses.yolov3 import yolov3_loss

        def loss_fn(raw, batch):
            return yolov3_loss(
                raw, batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
                self.anchors, self.anchor_mask, self.strides, self.nc)

        return loss_fn

    def make_infer_fn(self, model=None, conf_threshold=None):
        import jax
        from tpucv.decode.yolov3 import decode_yolov3
        from tpucv.ops.preprocess import normalize_images

        model = model or self.build_model()
        d = self.cfg.decode
        conf = d.conf_threshold if conf_threshold is None else conf_threshold

        @jax.jit
        def infer(variables, images_u8):
            x = normalize_images(images_u8, self.dtype)
            raw = model.apply(variables, x)
            return decode_yolov3(
                raw, self.anchors, self.anchor_mask, self.strides, self.nc,
                conf, d.iou_threshold, d.max_det, d.pre_nms_topk)

        return infer


class Yolo3Trainer(BaseTrainer):
    def set_model_algorithm(self):
        self.algorithm = Yolo3Algorithm(self.cfg)

    def load_data(self):
        self.train_loader, self.val_loader, self.val_index = \
            build_detection_loaders(self.cfg)
