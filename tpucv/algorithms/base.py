"""Shared detection-algorithm skeleton.

Every reference algorithm class repeats predict / VOC eval / COCO eval
plumbing (SURVEY §1.5); here it is written once against the uniform infer
contract: ``infer_fn(variables, uint8 batch) -> (boxes xyxy px, scores,
classes, valid)`` with fixed shapes. Eval is batched and device-resident.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from tpucv.configs.dataset_cfg import get_dataset_cfg
from tpucv.utils.image_process import letter_box, read_image, reverse_letter_box
from tpucv.utils.visualize import show_detection_results


def init_on_cpu(model, shape, dtype, seed: int = 0):
    """Initialise parameters on the host CPU backend and ship them to the
    default device. Model graphs here are large (DLA-34's init alone takes
    ~30 s to compile on CPU XLA); compiling init through a remote TPU
    compile service takes many minutes, while the transfer of the finished
    (tiny) param pytree is instant. Numerics are identical."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(seed),
            jnp.zeros(shape, dtype))
    if jax.default_backend() != "cpu":
        variables = jax.device_put(jax.device_get(variables))
    return variables


def cached_infer(algo, key: str, builder):
    """Per-algorithm cache of jitted inference closures: every make_*_fn()
    returns a NEW function object, so calling it per predict()/eval pass
    would retrace and recompile the full forward+decode graph each time."""
    cache = getattr(algo, "_eval_jit_cache", None)
    if cache is None:
        cache = algo._eval_jit_cache = {}
    fn = cache.get(key)
    if fn is None:
        fn = cache[key] = builder()
    return fn


class DetectionAlgorithm:
    def __init__(self, cfg):
        self.cfg = cfg
        self.input_size = cfg.dataset.input_size
        self.dtype = jnp.bfloat16 if cfg.train.mixed_precision else jnp.float32
        self.class_names = get_dataset_cfg(cfg.dataset.name)["classes"]

    # -------- subclass contract ------------------------------------------
    def build_model(self):
        raise NotImplementedError

    def build_loss(self):
        raise NotImplementedError

    def make_infer_fn(self, model=None, conf_threshold: Optional[float] = None):
        raise NotImplementedError

    def make_predict_infer_fn(self, model=None,
                              conf_threshold: Optional[float] = None):
        """Infer fn for the predict CLI. Defaults to the eval-harness
        boxes-only contract; families whose ``predict`` consumes extra
        outputs (seg masks, pose keypoints) override this so the CLI's
        prebuilt fn matches what ``predict`` unpacks."""
        return self.make_infer_fn(model, conf_threshold)

    @property
    def init_size(self) -> int:
        """Spatial size used for parameter init. Fully-convolutional models
        have size-independent params, so init compiles at a small size (the
        remote-compile path takes minutes at full resolution otherwise).
        Models with size-locked geometry (SSD) override this."""
        return min(self.input_size, 128) // 32 * 32 or 32

    def init_variables(self, model=None, seed: int = 0):
        model = model or self.build_model()
        s = self.init_size
        return init_on_cpu(model, (1, s, s, 3), self.dtype, seed)

    # -------- int8 post-training quantization -----------------------------
    def quantize_variables(self, variables, index, n_images: int = 32,
                           batch_size: int = 8):
        """PTQ entry point for the eval/predict harness: calibrate on the
        first ``n_images`` of ``index`` through the production letterbox
        path and return variables augmented with the int8 ``quant``
        collection (see tpucv/quant.py). The reference has no quantized
        deploy path (its deploy stubs are empty, SURVEY §1.11)."""
        from tpucv import quant
        from tpucv.ops.preprocess import (host_letterbox_geom,
                                          letterbox_images, normalize_images)

        model = self.build_model()
        s, C = self.input_size, self.raw_canvas

        @jax.jit
        def prep(canvases, hw, geom, hscale):
            lb, _, _ = letterbox_images(canvases, hw, s, geom=geom,
                                        scale=hscale)
            return normalize_images(lb, self.dtype)

        n = min(n_images, len(index))
        if n == 0 or batch_size <= 0:
            raise ValueError("int8 calibration needs at least one image")

        def batches():
            # generator: one calibration batch resident on device at a time
            for start in range(0, n, batch_size):
                idxs = list(range(start, min(start + batch_size, n)))
                canvases, hw, _, _ = self._fill_canvases(
                    index, idxs, batch_size, C)
                geom, hscale = host_letterbox_geom(hw, s)
                yield prep(jnp.asarray(canvases), jnp.asarray(hw),
                           jnp.asarray(geom), jnp.asarray(hscale))

        qv = quant.quantize_for_inference(model, variables, batches())
        if quant.count_quantized(qv["quant"]) == 0:
            raise ValueError(
                f"{type(model).__name__} has no quantizable convs — its "
                f"blocks lack the sow_calibration/quantized_conv hooks "
                f"(see tpucv/quant.py); refusing to silently run float")
        return qv

    # -------- shared inference plumbing ----------------------------------
    def predict(self, variables, image_path: str, infer_fn=None,
                save_dir: Optional[str] = "detect_results"):
        # cache across calls: looping predict() over a directory must not
        # retrace+recompile the forward+decode+NMS graph per image
        infer_fn = infer_fn or cached_infer(self, "predict",
                                            self.make_infer_fn)
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

    # raw-image canvas edge for the device-side letterbox path; COCO and
    # VOC images never exceed 640 on a side. Models with a larger input
    # size get a matching canvas so eval never bottlenecks detail through
    # an intermediate 640 downscale.
    RAW_CANVAS = 640

    @property
    def raw_canvas(self) -> int:
        return max(self.RAW_CANVAS, self.input_size)

    def _fill_canvases(self, index, idxs, batch_size: int, C: int):
        """Decode one eval batch onto fixed uint8 canvases (top-left),
        nearest pre-shrinking images larger than C. Returns (canvases
        (batch_size, C, C, 3), hw (batch_size, 2) placed dims, oshapes
        original dims, prescales per-axis effective pre-shrink ratios).

        Fast path: one threaded native call decodes the whole batch of JPEG
        paths (tpucv/native/imagepipe.cpp, bit-identical to the python
        loop); images it can't handle (ndarrays, non-JPEG) fall through to
        read_image + cv2."""
        from tpucv.native import imagepipe

        canvases = np.zeros((batch_size, C, C, 3), np.uint8)
        hw = np.ones((batch_size, 2), np.int32)
        oshapes = [None] * len(idxs)
        prescales = [None] * len(idxs)
        done = [False] * len(idxs)
        # fetch each item ONCE: ndarray-backed indices (synthetic data)
        # render the image in __getitem__, so probing index[i][0] twice
        # would generate every image twice per batch (code review r3)
        items = [index[i] for i in idxs]
        batch_paths = [it[0] for it in items]
        if imagepipe.available() and all(
                isinstance(p, str) for p in batch_paths):
            # zero=False: canvases is freshly np.zeros'd and the native
            # code leaves failed rows untouched
            res = imagepipe.decode_to_canvas(
                batch_paths, C, out=canvases, zero=False)
            if res is not None:
                _, nhw, norig, ok = res
                for j in range(len(idxs)):
                    if ok[j]:
                        hw[j] = nhw[j]
                        oh, ow = int(norig[j, 0]), int(norig[j, 1])
                        oshapes[j] = (oh, ow)
                        prescales[j] = (nhw[j, 1] / ow, nhw[j, 0] / oh)
                        done[j] = True
        for j in range(len(idxs)):
            if done[j]:
                continue
            path = batch_paths[j]
            img = read_image(path) if isinstance(path, str) else path
            oh, ow = img.shape[:2]               # exact original, pre-resize
            if oh > C or ow > C:
                # rare: pre-shrink on host so the raw fits the canvas.
                # INTER_NEAREST keeps the whole pipeline in one resampling
                # family — the chip letterbox is nearest too, and the
                # reference's single-host letterbox is INTER_NEAREST
                # (core/utils/image_process.py:48-66) — so oversized images
                # stay on the parity path (ADVICE r2).
                import cv2
                pre = C / max(oh, ow)
                img = cv2.resize(
                    img, (int(ow * pre), int(oh * pre)),
                    interpolation=cv2.INTER_NEAREST)
            h, w = img.shape[:2]
            canvases[j, :h, :w] = img
            hw[j] = (h, w)
            oshapes[j] = (oh, ow)
            # per-axis EFFECTIVE pre-shrink ratio (int truncation makes the
            # two axes differ slightly)
            prescales[j] = (w / ow, h / oh)
        return canvases, hw, oshapes, prescales

    def _batched_detections(self, variables, index, batch_size: int,
                            conf_threshold: float):
        """Batched eval loop with the letterbox ON DEVICE: the host ships
        each raw decoded image once (top-left on a fixed uint8 canvas) and
        the chip does resize+pad+normalize+forward+decode+NMS in one jitted
        program — host work is JPEG decode only (VERDICT round 1, item 3;
        replaces the reference's per-image host cv2 letter_box at
        core/utils/image_process.py:48-66 + core/algorithms/yolo_v8.py:345)."""
        from tpucv.ops.preprocess import host_letterbox_geom, letterbox_images

        s = self.input_size
        C = self.raw_canvas
        # cache the jitted program per conf threshold: in-training mAP
        # (trainer.evaluate_map) calls this every eval epoch, and a fresh
        # closure would recompile the full decode+NMS graph each time
        cache = getattr(self, "_eval_jit_cache", None)
        if cache is None:
            cache = self._eval_jit_cache = {}
        letterbox_and_infer = cache.get(("det", float(conf_threshold)))
        if letterbox_and_infer is None:
            infer = self.make_infer_fn(conf_threshold=conf_threshold)

            @jax.jit
            def letterbox_and_infer(variables, canvases, hw, geom, hscale):
                lb, scale, pad = letterbox_images(
                    canvases, hw, s, geom=geom, scale=hscale)
                boxes, scores, classes, valid = infer(variables, lb)
                return boxes, scores, classes, valid, scale, pad

            cache[("det", float(conf_threshold))] = letterbox_and_infer

        n = len(index)
        for start in range(0, n, batch_size):
            idxs = list(range(start, min(start + batch_size, n)))
            canvases, hw, oshapes, prescales = self._fill_canvases(
                index, idxs, batch_size, C)
            # f64 letterbox geometry on host: exact reference arithmetic
            geom, hscale = host_letterbox_geom(hw, s)
            boxes_b, scores_b, classes_b, valid_b, scale_b, pad_b = \
                jax.device_get(letterbox_and_infer(
                    variables, jnp.asarray(canvases), jnp.asarray(hw),
                    jnp.asarray(geom), jnp.asarray(hscale)))
            for j, i in enumerate(idxs):
                v = valid_b[j]
                pre_x, pre_y = prescales[j]
                # clip=False: the reference's eval protocol never clips
                # boxes to the image (image_process.py:69-97), and clipped
                # boxes score higher IoU — published numbers must not
                # flatter the framework
                boxes = reverse_letter_box(
                    boxes_b[j][v],
                    (float(scale_b[j]) * pre_x, float(scale_b[j]) * pre_y),
                    tuple(pad_b[j]), oshapes[j], clip=False)
                yield i, boxes, scores_b[j][v], classes_b[j][v]

    # -------- evaluate-CLI contract ---------------------------------------
    def build_eval_index(self, subset: str = "val"):
        """Dataset index for the evaluate CLI. Each algorithm owns its
        dataset-index construction so the CLI never enumerates families
        (the reference's ``evaluate.py:9-34`` hardcodes one family per
        branch; tpucv keeps the CLI family-agnostic). Detection families
        read COCO or VOC per the config's dataset name."""
        ds = get_dataset_cfg(self.cfg.dataset.name)
        if self.cfg.dataset.name == "coco":
            from tpucv.data.coco import COCOIndex
            return COCOIndex(
                os.path.join(ds["root"],
                             f"annotations/instances_{subset}2017.json"),
                os.path.join(ds["root"], f"{subset}2017"))
        from tpucv.data.voc import VOCDetectionIndex
        return VOCDetectionIndex(ds["root"], subset)

    def run_eval(self, variables, index, batch_size: int = 32,
                 plots: bool = False, **kw):
        """Family-appropriate eval over a ``build_eval_index`` result."""
        if self.cfg.dataset.name == "coco":
            if plots:
                print("--plots follows the VOC protocol (reference "
                      "mAP.py:208-300); ignored for COCO eval")
            return self.evaluate_on_coco(variables, index, batch_size, **kw)
        return self.evaluate_on_voc(variables, index, batch_size,
                                    plots=plots, **kw)

    # -------- evaluation harnesses ---------------------------------------
    def evaluate_on_coco(self, variables, index, batch_size: int = 32,
                         conf_threshold: float = 0.001,
                         result_dir: str = "result",
                         verbose: bool = True) -> Dict[str, float]:
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
        eval_records = getattr(index, "eval_gt_records", None)
        for i in range(len(index)):
            if eval_records is not None:
                # full protocol: official ann areas + crowd GTs flagged
                # iscrowd=1 so the matcher treats them as ignore regions
                # (pycocotools semantics, reference yolo_v8.py:330-381)
                gts.extend(eval_records(i))
                continue
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
        if verbose:
            ev.print_summary(stats)
        return stats

    @staticmethod
    def _coco_cross_summary(gts, dts) -> Dict[str, float]:
        """COCO 0.5:0.95 summary over VOC-format artifacts
        ({image_id, class_id, bbox xyxy[, difficult]})."""
        from tpucv.metrics.coco_map import COCOMeanAP

        cat_ids = sorted({g["class_id"] for g in gts} |
                         {d["class_id"] for d in dts})
        if not cat_ids:
            return {}
        coco_gts = []
        for g in gts:
            x1, y1, x2, y2 = g["bbox"]
            coco_gts.append({
                "image_id": g["image_id"], "category_id": g["class_id"],
                "bbox": [x1, y1, x2 - x1, y2 - y1],
                "area": float((x2 - x1) * (y2 - y1)),
                "iscrowd": 1 if g.get("difficult", False) else 0,
            })
        coco_dts = []
        for d in dts:
            x1, y1, x2, y2 = d["bbox"]
            coco_dts.append({
                "image_id": d["image_id"], "category_id": d["class_id"],
                "bbox": [x1, y1, x2 - x1, y2 - y1], "score": d["score"],
            })
        return COCOMeanAP(coco_gts, coco_dts, cat_ids).accumulate() \
            .summarize()

    def evaluate_on_voc(self, variables, index, batch_size: int = 32,
                        conf_threshold: float = 0.001,
                        iou_threshold: float = 0.5,
                        verbose: bool = True,
                        plots: bool = False,
                        plot_dir: str = "result/plots") -> Dict:
        from tpucv.metrics.voc_map import evaluate_voc_map, print_voc_map

        dts, gts = [], []
        for i, boxes, scores, classes in self._batched_detections(
                variables, index, batch_size, conf_threshold):
            for b, s_, c in zip(boxes, scores, classes):
                dts.append({"image_id": i, "class_id": int(c),
                            "bbox": b.tolist(), "score": float(s_)})
        eval_record = getattr(index, "eval_record", None)
        for i in range(len(index)):
            if eval_record is not None:
                # difficult objects included but flagged: the engine treats
                # them as ignore (neither TP nor FP), matching the
                # reference protocol (core/metrics/mAP.py:352-386)
                boxes, labels, difficult = eval_record(i)
            else:
                _, boxes, labels = index[i]
                difficult = np.zeros(len(boxes), bool)
            for b, l, dif in zip(boxes, labels, difficult):
                gts.append({"image_id": i, "class_id": int(l),
                            "bbox": np.asarray(b).tolist(),
                            "difficult": bool(dif)})
        res = evaluate_voc_map(gts, dts, self.class_names, iou_threshold)
        # COCO-protocol cross-summary on the SAME artifacts: the reference
        # runs get_coco_map (0.5:0.95 via COCOeval) alongside get_map on
        # identical dts/gts (core/metrics/mAP.py:930-958, called from
        # yolo_v8.py:320-327). Difficult GTs map to iscrowd=1 so the COCO
        # matcher treats them as ignore regions, the same semantics the
        # VOC engine gives them.
        res["coco"] = self._coco_cross_summary(gts, dts)
        if verbose:
            print_voc_map(res)
            print("COCO-protocol cross-summary (same detections/GTs):")
            for k in ("AP", "AP50", "AP75"):
                if k in res["coco"]:
                    print(f"  {k}: {res['coco'][k]:.4f}")
        if plots:
            # per-class AP bar chart + PR curves, the reference's eval-time
            # artifacts (mAP.py:208-300, drawn inside get_map :302-835)
            from tpucv.metrics.voc_map import save_plots
            save_plots(res, plot_dir)
            print(f"AP/PR plots written to {plot_dir}/")
        return res
