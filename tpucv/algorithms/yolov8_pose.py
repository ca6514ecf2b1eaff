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
        from tpucv.algorithms.yolov8 import yolo_decode_args
        kw = yolo_decode_args(self.cfg, self.nc, conf_threshold)
        kw["kpt_shape"] = tuple(self.cfg.arch.kpt_shape)
        return kw

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

    # ------------------------------------------------------------ evaluate
    def _batched_pose_detections(self, variables, index, batch_size: int,
                                 conf_threshold: float):
        """Pose twin of the base batched eval loop (algorithms/base.py):
        device-side letterbox + forward + decode, plus the keypoint outputs,
        with boxes AND keypoints mapped back to original image coords. The
        per-batch canvas fill (incl. the native threaded JPEG decode) is
        shared with the base harness via _fill_canvases."""
        import jax
        import jax.numpy as jnp
        from tpucv.ops.preprocess import (host_letterbox_geom,
                                          letterbox_images)
        from tpucv.utils.image_process import reverse_letter_box

        s = self.input_size
        C = self.raw_canvas
        cache = getattr(self, "_eval_jit_cache", None)
        if cache is None:
            cache = self._eval_jit_cache = {}
        letterbox_and_infer = cache.get(("pose", float(conf_threshold)))
        if letterbox_and_infer is None:
            infer = self.make_pose_infer_fn(conf_threshold=conf_threshold)

            @jax.jit
            def letterbox_and_infer(variables, canvases, hw, geom, hscale):
                lb, scale, pad = letterbox_images(
                    canvases, hw, s, geom=geom, scale=hscale)
                boxes, scores, classes, valid, kpts = infer(variables, lb)
                return boxes, scores, classes, valid, kpts, scale, pad

            cache[("pose", float(conf_threshold))] = letterbox_and_infer

        n = len(index)
        for start in range(0, n, batch_size):
            idxs = list(range(start, min(start + batch_size, n)))
            canvases, hw, oshapes, prescales = self._fill_canvases(
                index, idxs, batch_size, C)
            geom, hscale = host_letterbox_geom(hw, s)
            boxes_b, scores_b, classes_b, valid_b, kpts_b, scale_b, pad_b = \
                jax.device_get(letterbox_and_infer(
                    variables, jnp.asarray(canvases), jnp.asarray(hw),
                    jnp.asarray(geom), jnp.asarray(hscale)))
            for j, i in enumerate(idxs):
                v = valid_b[j]
                pre_x, pre_y = prescales[j]
                sx = float(scale_b[j]) * pre_x
                sy = float(scale_b[j]) * pre_y
                # clip=False: eval protocol maps boxes unclipped, matching
                # the reference's reverse letterbox (see base.py eval loop)
                boxes = reverse_letter_box(
                    boxes_b[j][v], (sx, sy), tuple(pad_b[j]), oshapes[j],
                    clip=False)
                kv = np.asarray(kpts_b[j][v]).copy()
                kv[..., 0] = (kv[..., 0] - float(pad_b[j][0])) / max(sx, 1e-9)
                kv[..., 1] = (kv[..., 1] - float(pad_b[j][1])) / max(sy, 1e-9)
                yield i, boxes, scores_b[j][v], classes_b[j][v], kv

    def build_eval_index(self, subset: str = "val"):
        """person_keypoints COCO index when present, synthetic pose
        otherwise (evaluate-CLI contract, see base.build_eval_index)."""
        import os
        from tpucv.configs.dataset_cfg import get_dataset_cfg
        from tpucv.data.pose_dataset import (COCOKeypointIndex,
                                             SyntheticPoseIndex)
        ds = get_dataset_cfg(self.cfg.dataset.name)
        ann = os.path.join(
            ds["root"], f"annotations/person_keypoints_{subset}2017.json")
        img_root = os.path.join(ds["root"], f"{subset}2017")
        if os.path.isfile(ann) and os.path.isdir(img_root):
            return COCOKeypointIndex(ann, img_root)
        print(f"person_keypoints not found under {ds['root']!r} — "
              f"synthetic pose data")
        return SyntheticPoseIndex(16, self.input_size,
                                  nk=self.cfg.arch.kpt_shape[0], seed=1)

    def run_eval(self, variables, index, batch_size: int = 32,
                 plots: bool = False, **kw):
        if plots:
            print("--plots follows the VOC protocol; ignored for pose eval")
        return self.evaluate_on_coco(variables, index, batch_size, **kw)

    def evaluate_on_coco(self, variables, index, batch_size: int = 32,
                         conf_threshold: float = 0.001,
                         result_dir: str = "result",
                         verbose: bool = True):
        """Person bbox mAP + OKS keypoint mAP (COCOeval
        iouType='keypoints' protocol) over a keypoint index."""
        import json
        import os
        from tpucv.metrics.coco_map import (COCOKeypointAP, COCOMeanAP,
                                            OKS_SIGMAS)

        nk = self.cfg.arch.kpt_shape[0]
        dts_box, dts_kpt = [], []
        for i, boxes, scores, classes, kpts in self._batched_pose_detections(
                variables, index, batch_size, conf_threshold):
            img_id = index.image_id(i)
            for b, s_, kp in zip(boxes, scores, kpts):
                dts_box.append({
                    "image_id": img_id, "category_id": 1,
                    "bbox": [float(b[0]), float(b[1]),
                             float(b[2] - b[0]), float(b[3] - b[1])],
                    "score": float(s_)})
                dts_kpt.append({
                    "image_id": img_id, "category_id": 1,
                    "keypoints": np.asarray(kp, np.float32).reshape(-1),
                    "score": float(s_)})
        os.makedirs(result_dir, exist_ok=True)
        with open(os.path.join(result_dir, "eval_results.json"), "w") as f:
            json.dump([{**d, "keypoints": d["keypoints"].tolist()}
                       for d in dts_kpt], f)
        gts = [r for i in range(len(index)) for r in index.eval_gt_records(i)]
        box_stats = COCOMeanAP(gts, dts_box, index.cat_ids) \
            .accumulate().summarize()
        sigmas = OKS_SIGMAS if nk == len(OKS_SIGMAS) \
            else np.full(nk, 0.05)
        kp_ev = COCOKeypointAP(gts, dts_kpt, index.cat_ids,
                               sigmas=sigmas).accumulate()
        kpt_stats = kp_ev.summarize()
        if verbose:
            print(f"person bbox: AP={box_stats['AP']:.3f}  "
                  f"AP50={box_stats['AP50']:.3f}")
            print("keypoints (OKS):")
            kp_ev.print_summary(kpt_stats)
        stats = dict(box_stats)
        stats.update({f"kpt_{k}": v for k, v in kpt_stats.items()})
        return stats

    def predict(self, variables, image_path: str, infer_fn=None,
                save_dir: Optional[str] = "detect_results"):
        import cv2
        from tpucv.utils.image_process import (
            letter_box, read_image, reverse_letter_box)
        from tpucv.utils.visualize import show_detection_results

        from tpucv.algorithms.base import cached_infer
        infer_fn = infer_fn or cached_infer(
            self, "predict_pose", self.make_pose_infer_fn)
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
