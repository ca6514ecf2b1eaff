"""YOLOv8-seg algorithm — instance segmentation on the golden-verified
YOLOv8 stack (no reference counterpart: the torch repo has no instance-seg
task). Inherits the batched device-resident eval harness, so bbox mAP on
COCO/VOC works unchanged; predict adds per-detection masks + overlay.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from tpucv.algorithms.base import DetectionAlgorithm
from tpucv.decode.yolov8_seg import decode_seg
from tpucv.losses.yolov8_seg import yolov8_seg_loss
from tpucv.models.yolov8 import Yolo8
from tpucv.ops.preprocess import normalize_images
from tpucv.registry import model_registry


@model_registry("yolo8_seg")
class YOLOv8Seg(DetectionAlgorithm):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.nc = cfg.num_classes

    def build_model(self) -> Yolo8:
        a = self.cfg.arch
        return Yolo8(scale=a.model_type, nc=self.nc, reg_max=a.reg_max,
                     head="segment", n_masks=a.n_masks, dtype=self.dtype)

    def build_loss(self):
        l, a = self.cfg.loss, self.cfg.arch

        def loss_fn(raw, batch):
            return yolov8_seg_loss(
                raw, batch["gt_labels"], batch["gt_bboxes"],
                batch["gt_mask"], batch["gt_inst_masks"],
                nc=self.nc, reg_max=a.reg_max, strides=a.strides,
                box_gain=l.box_gain, cls_gain=l.cls_gain,
                dfl_gain=l.dfl_gain, mask_gain=l.mask_gain,
                tal_topk=l.tal_topk, mask_topk=l.mask_topk)

        return loss_fn

    def _decode_args(self, conf_threshold):
        from tpucv.algorithms.yolov8 import yolo_decode_args
        return yolo_decode_args(self.cfg, self.nc, conf_threshold)

    def make_infer_fn(self, model=None, conf_threshold: Optional[float] = None):
        """Boxes-only contract for the shared eval harness."""
        model = model or self.build_model()
        kw = self._decode_args(conf_threshold)

        @jax.jit
        def infer(variables, images_u8):
            x = normalize_images(images_u8, self.dtype)
            raw = model.apply(variables, x)
            return decode_seg(raw, **kw)[:4]

        return infer

    # the predict CLI needs the mask outputs, not the boxes-only contract
    def make_predict_infer_fn(self, model=None,
                              conf_threshold: Optional[float] = None):
        return self.make_seg_infer_fn(model, conf_threshold)

    def make_seg_infer_fn(self, model=None,
                          conf_threshold: Optional[float] = None):
        """Full contract: (+ mask coefficients, prototypes)."""
        model = model or self.build_model()
        kw = self._decode_args(conf_threshold)

        @jax.jit
        def infer(variables, images_u8):
            x = normalize_images(images_u8, self.dtype)
            raw = model.apply(variables, x)
            return decode_seg(raw, **kw)

        return infer

    def evaluate_mask_ap(self, variables, index, batch_size: int = 8,
                         conf_threshold: float = 0.001,
                         verbose: bool = True):
        """Mask AP — the COCO iouType='segm' protocol evaluated at the
        letterboxed canvas resolution with dense masks (COCOMaskAP).

        Detection masks come from the prototype head thresholded at 0.5 on
        the (s, s) canvas; GT masks are rasterized on the same canvas —
        polygons when the index provides them (``index.polygons``),
        box-filled rectangles otherwise (exact for the synthetic data,
        whose objects ARE rectangles). The reference has no instance-seg
        task; this locks tpucv's own mask pipeline (prototype combine,
        crop-to-box, threshold) the way bbox eval locks decode+NMS.
        """
        import cv2

        from tpucv.algorithms.base import cached_infer
        from tpucv.metrics.coco_map import COCOMaskAP
        from tpucv.ops.masks import process_mask
        from tpucv.utils.image_process import letter_box, read_image

        s = self.input_size
        infer = cached_infer(
            self, f"eval_seg@{conf_threshold}",
            lambda: self.make_seg_infer_fn(conf_threshold=conf_threshold))
        polys = getattr(index, "polygons", None)

        gts, dts = [], []
        canvases, geoms = [], []
        for i in range(len(index)):
            img, boxes, labels = index[i][:3]
            if isinstance(img, str):
                img = read_image(img)
            canvas, scale, pad = letter_box(img, (s, s))
            canvases.append(canvas)
            geoms.append((scale, pad))
            for j, (b, l) in enumerate(zip(boxes, labels)):
                m = np.zeros((s, s), np.uint8)
                pts = None
                if callable(polys):
                    pl = polys(i, j)
                    if pl:
                        pts = [np.round(
                            np.asarray(p, np.float32).reshape(-1, 2)
                            * scale + np.asarray(pad, np.float32)
                        ).astype(np.int32) for p in pl if len(p) >= 6]
                if pts:
                    cv2.fillPoly(m, pts, 1)
                else:
                    x1, y1, x2, y2 = np.asarray(b, np.float32) * scale
                    x1, x2 = x1 + pad[0], x2 + pad[0]
                    y1, y2 = y1 + pad[1], y2 + pad[1]
                    m[int(y1):max(int(np.ceil(y2)), int(y1) + 1),
                      int(x1):max(int(np.ceil(x2)), int(x1) + 1)] = 1
                gts.append({"image_id": i, "category_id": int(l),
                            "mask": m, "area": float(m.sum()),
                            "iscrowd": 0})

        for start in range(0, len(canvases), batch_size):
            chunk = canvases[start:start + batch_size]
            nb = len(chunk)
            if nb < batch_size:    # pad to the compiled static shape
                chunk = chunk + [np.zeros((s, s, 3), np.uint8)] * \
                    (batch_size - nb)
            out = jax.device_get(infer(variables, jnp.asarray(
                np.stack(chunk))))
            boxes_b, scores_b, classes_b, valid_b, coefs_b, protos_b = out
            for bi in range(nb):
                v = np.asarray(valid_b[bi])
                if not v.any():
                    continue
                masks = np.asarray(jax.device_get(process_mask(
                    jnp.asarray(protos_b[bi]), jnp.asarray(coefs_b[bi]),
                    jnp.asarray(boxes_b[bi]), (s, s), upsample=True)))
                for k in np.flatnonzero(v):
                    dts.append({
                        "image_id": start + bi,
                        "category_id": int(classes_b[bi][k]),
                        "score": float(scores_b[bi][k]),
                        "mask": masks[k] > 0.5,
                    })

        cat_ids = list(range(len(self.class_names)))
        ev = COCOMaskAP(gts, dts, cat_ids).accumulate()
        stats = ev.summarize()
        if verbose:
            print("Mask AP (COCO segm protocol, canvas resolution):")
            ev.print_summary(stats)
        return stats

    def predict(self, variables, image_path: str, infer_fn=None,
                save_dir: Optional[str] = "detect_results"):
        import cv2
        from tpucv.ops.masks import process_mask
        from tpucv.utils.image_process import (
            letter_box, read_image, reverse_letter_box)
        from tpucv.utils.visualize import show_detection_results

        from tpucv.algorithms.base import cached_infer
        infer_fn = infer_fn or cached_infer(
            self, "predict_seg", self.make_seg_infer_fn)
        img = read_image(image_path) if isinstance(image_path, str) \
            else image_path
        s = self.input_size
        canvas, scale, pad = letter_box(img, (s, s))
        boxes, scores, classes, valid, coefs, protos = jax.device_get(
            infer_fn(variables, jnp.asarray(canvas[None])))
        v = np.asarray(valid[0])
        boxes_c = np.asarray(boxes[0])          # canvas pixels
        masks = np.asarray(jax.device_get(process_mask(
            jnp.asarray(protos[0]), jnp.asarray(coefs[0]),
            jnp.asarray(boxes_c), (s, s), upsample=True)))  # (max_det, s, s)
        boxes_img = reverse_letter_box(boxes_c[v], scale, pad, img.shape[:2])
        scores_v, classes_v = np.asarray(scores[0])[v], np.asarray(classes[0])[v]
        masks_v = masks[v] > 0.5

        overlay = img.copy()
        rng = np.random.default_rng(0)
        for m in masks_v:
            # undo the letterbox on the mask: crop pad, resize to image
            mh = m[int(pad[1]):s - int(pad[1]) or s,
                   int(pad[0]):s - int(pad[0]) or s]
            mi = cv2.resize(mh.astype(np.uint8),
                            (img.shape[1], img.shape[0])) > 0
            color = rng.integers(60, 255, 3)
            overlay[mi] = (0.5 * overlay[mi] + 0.5 * color).astype(np.uint8)
        saved = None
        if save_dir:
            import os
            name = (os.path.splitext(os.path.basename(image_path))[0]
                    if isinstance(image_path, str) else "array")
            saved = show_detection_results(
                overlay, boxes_img, scores_v, classes_v, self.class_names,
                save_dir, name + "_seg")
        return {"boxes": boxes_img, "scores": scores_v, "classes": classes_v,
                "masks": masks_v, "image": img, "saved": saved}
