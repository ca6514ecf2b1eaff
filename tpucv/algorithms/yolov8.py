"""YOLOv8 algorithm façade (reference ``core/algorithms/yolo_v8.py:127-381``):
model/loss factories, single-image predict, batched decode, VOC/COCO eval.

The reference evaluates one image per forward (yolo_v8.py:345-358); here eval
is batched and device-resident — the jitted graph takes uint8 batches and
returns fixed-shape (boxes, scores, classes, valid); only the final
letterbox-reversal and metric bookkeeping run on host.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from tpucv.configs.dataset_cfg import (
    COCO80_TO_COCO91, get_dataset_cfg)
from tpucv.decode.yolov8 import decode_boxes
from tpucv.losses.yolov8 import yolov8_loss
from tpucv.models.yolov8 import Yolo8
from tpucv.ops.preprocess import normalize_images
from tpucv.registry import model_registry
from tpucv.utils.image_process import letter_box, read_image, reverse_letter_box
from tpucv.utils.visualize import show_detection_results


@model_registry("yolo8_det")
class YOLOv8:
    def __init__(self, cfg):
        self.cfg = cfg
        self.nc = cfg.num_classes
        self.input_size = cfg.dataset.input_size
        self.dtype = jnp.bfloat16 if cfg.train.mixed_precision else jnp.float32
        self.class_names = get_dataset_cfg(cfg.dataset.name)["classes"]

    # ------------------------------------------------------------ factories
    def build_model(self) -> Yolo8:
        return Yolo8(scale=self.cfg.arch.model_type, nc=self.nc,
                     reg_max=self.cfg.arch.reg_max, dtype=self.dtype)

    def init_variables(self, model=None, seed: int = 0):
        model = model or self.build_model()
        s = self.input_size
        return jax.jit(model.init)(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, s, s, 3), self.dtype))

    def build_loss(self):
        l, a = self.cfg.loss, self.cfg.arch

        def loss_fn(raw, batch):
            return yolov8_loss(
                raw, batch["gt_labels"], batch["gt_bboxes"], batch["gt_mask"],
                nc=self.nc, reg_max=a.reg_max, strides=a.strides,
                box_gain=l.box_gain, cls_gain=l.cls_gain, dfl_gain=l.dfl_gain,
                tal_topk=l.tal_topk)

        return loss_fn

    # -------------------------------------------------------------- decode
    def make_infer_fn(self, model=None, conf_threshold: Optional[float] = None):
        """jitted uint8 batch -> (boxes xyxy px, scores, classes, valid)."""
        model = model or self.build_model()
        d = self.cfg.decode
        conf = d.conf_threshold if conf_threshold is None else conf_threshold

        @jax.jit
        def infer(variables, images_u8):
            x = normalize_images(images_u8, self.dtype)
            raw = model.apply(variables, x)
            return decode_boxes(
                raw, nc=self.nc, reg_max=self.cfg.arch.reg_max,
                strides=self.cfg.arch.strides,
                conf_threshold=conf, iou_threshold=d.iou_threshold,
                max_det=d.max_det, pre_nms_topk=d.pre_nms_topk)

        return infer

    # ------------------------------------------------------------- predict
    def predict(self, variables, image_path: str, infer_fn=None,
                save_dir: Optional[str] = "detect_results"):
        """Single-image detection (reference yolo_v8.py:172-208)."""
        infer_fn = infer_fn or self.make_infer_fn()
        img = read_image(image_path)
        s = self.input_size
        canvas, scale, pad = letter_box(img, (s, s))
        boxes, scores, classes, valid = jax.device_get(
            infer_fn(variables, jnp.asarray(canvas[None])))
        v = np.asarray(valid[0])
        boxes = reverse_letter_box(
            np.asarray(boxes[0])[v], scale, pad, img.shape[:2])
        scores, classes = np.asarray(scores[0])[v], np.asarray(classes[0])[v]
        out_path = None
        if save_dir:
            name = os.path.splitext(os.path.basename(image_path))[0]
            out_path = show_detection_results(
                img, boxes, scores, classes, self.class_names, save_dir, name)
        return {"boxes": boxes, "scores": scores, "classes": classes,
                "image": img, "saved": out_path}

    # ----------------------------------------------------------- evaluation
    def _batched_detections(self, variables, index, batch_size: int,
                            conf_threshold: float, progress: bool = True):
        """Run letterbox -> jitted infer -> reverse-letterbox over an index.
        Yields (sample_idx, boxes xyxy original px, scores, classes)."""
        infer = self.make_infer_fn(conf_threshold=conf_threshold)
        s = self.input_size
        n = len(index)
        for start in range(0, n, batch_size):
            idxs = list(range(start, min(start + batch_size, n)))
            canvases, metas = [], []
            for i in idxs:
                path, _, _ = index[i]
                img = read_image(path) if isinstance(path, str) else path
                canvas, scale, pad = letter_box(img, (s, s))
                canvases.append(canvas)
                metas.append((scale, pad, img.shape[:2]))
            # pad the final partial batch to keep one compiled shape
            while len(canvases) < batch_size:
                canvases.append(np.zeros_like(canvases[0]))
            out = jax.device_get(
                infer(variables, jnp.asarray(np.stack(canvases))))
            boxes_b, scores_b, classes_b, valid_b = out
            for j, i in enumerate(idxs):
                scale, pad, oshape = metas[j]
                v = valid_b[j]
                boxes = reverse_letter_box(boxes_b[j][v], scale, pad, oshape)
                yield i, boxes, scores_b[j][v], classes_b[j][v]

    def evaluate_on_coco(self, variables, index, batch_size: int = 32,
                         conf_threshold: float = 0.001,
                         result_dir: str = "result") -> Dict[str, float]:
        """Batched COCO eval (reference yolo_v8.py:330-381): detections json +
        COCO mAP summary."""
        from tpucv.metrics.coco_map import COCOMeanAP

        dts = []
        for i, boxes, scores, classes in self._batched_detections(
                variables, index, batch_size, conf_threshold):
            img_id = index.image_id(i)
            for b, s_, c in zip(boxes, scores, classes):
                dts.append({
                    "image_id": img_id,
                    "category_id": index.contig_to_cat[int(c)],
                    "bbox": [float(b[0]), float(b[1]),
                             float(b[2] - b[0]), float(b[3] - b[1])],
                    "score": float(s_),
                })
        os.makedirs(result_dir, exist_ok=True)
        with open(os.path.join(result_dir, "eval_results.json"), "w") as f:
            json.dump(dts, f)
        gts = []
        for i in range(len(index)):
            _, boxes, labels = index[i]
            img_id = index.image_id(i)
            for b, l in zip(boxes, labels):
                gts.append({
                    "image_id": img_id,
                    "category_id": index.contig_to_cat[int(l)],
                    "bbox": [float(b[0]), float(b[1]),
                             float(b[2] - b[0]), float(b[3] - b[1])],
                    "area": float((b[2] - b[0]) * (b[3] - b[1])),
                    "iscrowd": 0,
                })
        ev = COCOMeanAP(gts, dts, index.cat_ids).accumulate()
        stats = ev.summarize()
        ev.print_summary(stats)
        return stats

    def evaluate_on_voc(self, variables, index, batch_size: int = 32,
                        conf_threshold: float = 0.001,
                        iou_threshold: float = 0.5) -> Dict:
        """Batched VOC eval (reference yolo_v8.py:244-328, txt-free)."""
        from tpucv.metrics.voc_map import evaluate_voc_map, print_voc_map

        dts, gts = [], []
        for i, boxes, scores, classes in self._batched_detections(
                variables, index, batch_size, conf_threshold):
            for b, s_, c in zip(boxes, scores, classes):
                dts.append({"image_id": i, "class_id": int(c),
                            "bbox": b.tolist(), "score": float(s_)})
        for i in range(len(index)):
            _, boxes, labels = index[i]
            for b, l in zip(boxes, labels):
                gts.append({"image_id": i, "class_id": int(l),
                            "bbox": np.asarray(b).tolist()})
        res = evaluate_voc_map(gts, dts, self.class_names, iou_threshold)
        print_voc_map(res)
        return res
