"""YOLOv8-pose algorithm — person keypoints on the golden-verified YOLOv8
stack (no reference counterpart). Inherits the batched eval harness (bbox
mAP on the person class); predict draws skeleton keypoints.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from tpucv.algorithms.base import DetectionAlgorithm
from tpucv.decode.yolov8_pose import decode_pose
from tpucv.losses.yolov8_pose import yolov8_pose_loss
from tpucv.models.yolov8 import Yolo8
from tpucv.ops.preprocess import normalize_images
from tpucv.registry import model_registry


@model_registry("yolo8_pose")
class YOLOv8Pose(DetectionAlgorithm):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.nc = cfg.num_classes
        self.class_names = ["person"]

    def build_model(self) -> Yolo8:
        a = self.cfg.arch
        return Yolo8(scale=a.model_type, nc=self.nc, reg_max=a.reg_max,
                     head="pose", kpt_shape=tuple(a.kpt_shape),
                     dtype=self.dtype)

    def build_loss(self):
        l, a = self.cfg.loss, self.cfg.arch

        def loss_fn(raw, batch):
            return yolov8_pose_loss(
                raw, batch["gt_labels"], batch["gt_bboxes"],
                batch["gt_mask"], batch["gt_kpts"],
                nc=self.nc, reg_max=a.reg_max, strides=a.strides,
                box_gain=l.box_gain, cls_gain=l.cls_gain,
                dfl_gain=l.dfl_gain, kpt_gain=l.kpt_gain,
                kobj_gain=l.kobj_gain, tal_topk=l.tal_topk,
                pose_topk=l.pose_topk)

        return loss_fn

    def _decode_args(self, conf_threshold):
        d = self.cfg.decode
        conf = d.conf_threshold if conf_threshold is None else conf_threshold
        topk = d.pre_nms_topk if conf < 0.01 else min(d.pre_nms_topk, 1024)
        return dict(kpt_shape=tuple(self.cfg.arch.kpt_shape), nc=self.nc,
                    reg_max=self.cfg.arch.reg_max,
                    strides=self.cfg.arch.strides, conf_threshold=conf,
                    iou_threshold=d.iou_threshold, max_det=d.max_det,
                    pre_nms_topk=topk)

    def make_infer_fn(self, model=None, conf_threshold: Optional[float] = None):
        """Boxes-only contract for the shared eval harness."""
        model = model or self.build_model()
        kw = self._decode_args(conf_threshold)

        @jax.jit
        def infer(variables, images_u8):
            x = normalize_images(images_u8, self.dtype)
            raw = model.apply(variables, x)
            return decode_pose(raw, **kw)[:4]

        return infer

    # the predict CLI needs the keypoint outputs, not the boxes-only contract
    def make_predict_infer_fn(self, model=None,
                              conf_threshold: Optional[float] = None):
        return self.make_pose_infer_fn(model, conf_threshold)

    def make_pose_infer_fn(self, model=None,
                           conf_threshold: Optional[float] = None):
        model = model or self.build_model()
        kw = self._decode_args(conf_threshold)

        @jax.jit
        def infer(variables, images_u8):
            x = normalize_images(images_u8, self.dtype)
            raw = model.apply(variables, x)
            return decode_pose(raw, **kw)

        return infer

    def predict(self, variables, image_path: str, infer_fn=None,
                save_dir: Optional[str] = "detect_results"):
        import cv2
        from tpucv.utils.image_process import (
            letter_box, read_image, reverse_letter_box)
        from tpucv.utils.visualize import show_detection_results

        infer_fn = infer_fn or self.make_pose_infer_fn()
        img = read_image(image_path) if isinstance(image_path, str) \
            else image_path
        s = self.input_size
        canvas, scale, pad = letter_box(img, (s, s))
        boxes, scores, classes, valid, kpts = jax.device_get(
            infer_fn(variables, jnp.asarray(canvas[None])))
        v = np.asarray(valid[0])
        boxes_img = reverse_letter_box(
            np.asarray(boxes[0])[v], scale, pad, img.shape[:2])
        kv = np.asarray(kpts[0])[v].copy()          # canvas px
        # keypoints back to image coords (same letterbox inverse as boxes;
        # letter_box's scale is a scalar)
        kv[..., 0] = (kv[..., 0] - pad[0]) / scale
        kv[..., 1] = (kv[..., 1] - pad[1]) / scale
        overlay = img.copy()
        for inst in kv:
            for x, y, c in inst:
                if c > 0.5:
                    cv2.circle(overlay, (int(x), int(y)), 3, (0, 255, 0), -1)
        saved = None
        if save_dir:
            import os
            name = (os.path.splitext(os.path.basename(image_path))[0]
                    if isinstance(image_path, str) else "array")
            saved = show_detection_results(
                overlay, boxes_img, np.asarray(scores[0])[v],
                np.asarray(classes[0])[v], self.class_names, save_dir,
                name + "_pose")
        return {"boxes": boxes_img, "scores": np.asarray(scores[0])[v],
                "classes": np.asarray(classes[0])[v], "keypoints": kv,
                "image": img, "saved": saved}
