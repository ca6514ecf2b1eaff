"""DeepLabV3+ algorithm façade (reference
``core/algorithms/segmentation_2d.py:42-177``): loss factory (CE/focal),
argmax -> colormap postprocess (:20-29), blend overlay (:32-39), VOC mIoU
eval (:115-166)."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from tpucv.data.segmentation_dataset import VOC_COLORMAP
from tpucv.losses.segmentation import cross_entropy_loss, focal_loss
from tpucv.metrics.seg_metrics import SegmentationMetrics
from tpucv.models.deeplabv3plus import DeeplabV3Plus
from tpucv.ops.preprocess import imagenet_normalize, normalize_images
from tpucv.registry import model_registry
from tpucv.utils.image_process import read_image

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def postprocess_seg2d(class_map: np.ndarray) -> np.ndarray:
    """Class indices -> RGB colormap image (reference :20-29)."""
    cm = np.asarray(VOC_COLORMAP, np.uint8)
    return cm[np.clip(class_map, 0, len(cm) - 1)]


def blend(image_rgb: np.ndarray, seg_rgb: np.ndarray,
          alpha: float = 0.6) -> np.ndarray:
    """Overlay the colourised mask on the image (reference :32-39)."""
    return (image_rgb * (1 - alpha) + seg_rgb * alpha).astype(np.uint8)


@model_registry("deeplabv3plus")
class DeeplabV3PlusA:
    def __init__(self, cfg):
        self.cfg = cfg
        self.nc = cfg.num_classes
        self.input_size = cfg.dataset.input_size
        self.dtype = jnp.bfloat16 if cfg.train.mixed_precision else jnp.float32

    def build_model(self) -> DeeplabV3Plus:
        return DeeplabV3Plus(
            num_classes=self.nc, backbone=self.cfg.arch.backbone,
            output_stride=self.cfg.arch.output_stride, dtype=self.dtype)

    def init_variables(self, model=None, seed: int = 0):
        from tpucv.algorithms.base import init_on_cpu
        model = model or self.build_model()
        s = min(self.cfg.arch.crop_size, 129)  # params are size-independent
        return init_on_cpu(model, (1, s, s, 3), self.dtype, seed)

    def build_loss(self):
        l = self.cfg.loss

        def loss_fn(raw, batch):
            if l.name == "focal":
                return focal_loss(raw, batch["labels"], l.alpha, l.gamma,
                                  l.ignore_index)
            return cross_entropy_loss(raw, batch["labels"], l.ignore_index)

        return loss_fn

    def make_predict_infer_fn(self, model=None, **_):
        """Predict-CLI contract (same as eval here: class-index map)."""
        return self.make_infer_fn(model)

    def quantize_variables(self, variables, index, n_images: int = 8,
                           batch_size: int = 4):
        """int8 PTQ (tpucv/quant.py): calibrate on the first images of the
        index through the predict path's resize + imagenet normalization.
        Index items may be paths, ndarrays, or (image, ...) tuples."""
        from tpucv import quant

        model = self.build_model()
        s = self.cfg.arch.crop_size
        n = min(n_images, len(index))
        if n == 0 or batch_size <= 0:
            raise ValueError("int8 calibration needs at least one image")

        def batches():
            buf = []
            for i in range(n):
                item = index[i]
                img = item[0] if isinstance(item, (tuple, list)) else item
                img = read_image(img) if isinstance(img, str) else \
                    np.asarray(img)
                if img.dtype != np.uint8:
                    img = np.clip(img, 0, 255).astype(np.uint8)
                buf.append(cv2.resize(img, (s, s),
                                      interpolation=cv2.INTER_LINEAR))
                if len(buf) == batch_size or i == n - 1:
                    u8 = jnp.asarray(np.stack(buf))
                    buf.clear()
                    yield imagenet_normalize(
                        normalize_images(u8, self.dtype))

        qv = quant.quantize_for_inference(model, variables, batches())
        if quant.count_quantized(qv["quant"]) == 0:
            raise ValueError(
                "DeeplabV3Plus produced no quantizable convs; refusing to "
                "silently run float")
        return qv

    def make_infer_fn(self, model=None, **_):
        model = model or self.build_model()

        @jax.jit
        def infer(variables, images_u8):
            x = imagenet_normalize(normalize_images(images_u8, self.dtype))
            logits = model.apply(variables, x)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        return infer

    def predict(self, variables, image_path: str, infer_fn=None,
                save_dir: Optional[str] = "detect_results"):
        import os
        import time
        from tpucv.algorithms.base import cached_infer
        infer_fn = infer_fn or cached_infer(
            self, "predict", self.make_infer_fn)
        img = read_image(image_path)
        s = self.cfg.arch.crop_size
        resized = cv2.resize(img, (s, s), interpolation=cv2.INTER_LINEAR)
        cls_map = np.asarray(jax.device_get(
            infer_fn(variables, jnp.asarray(resized[None]))))[0]
        seg_rgb = postprocess_seg2d(cls_map)
        seg_full = cv2.resize(seg_rgb, (img.shape[1], img.shape[0]),
                              interpolation=cv2.INTER_NEAREST)
        out = blend(img, seg_full)
        path = None
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            name = os.path.splitext(os.path.basename(image_path))[0]
            path = os.path.join(
                save_dir, f"{name}@{time.strftime('%Y%m%d%H%M%S')}.jpg")
            cv2.imwrite(path, cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
        return {"class_map": cls_map, "overlay": out, "saved": path}

    def build_eval_index(self, subset: str = "val"):
        """Sample list for the evaluate CLI (and int8 calibration): VOC
        SegmentationClass pairs when the dataset root exists, synthetic
        otherwise."""
        import os
        from tpucv.configs.dataset_cfg import get_dataset_cfg
        from tpucv.data.segmentation_dataset import (build_voc_seg_samples,
                                                     synthetic_seg_samples)
        ds = get_dataset_cfg(self.cfg.dataset.name)
        if os.path.isdir(os.path.join(ds["root"], "SegmentationClass")):
            return build_voc_seg_samples(ds["root"], subset)
        print(f"dataset root {ds['root']!r} not found — synthetic seg data")
        return synthetic_seg_samples(8, self.cfg.arch.crop_size, self.nc, 1)

    def run_eval(self, variables, samples, batch_size: int = 32,
                 plots: bool = False, **kw):
        if plots:
            print("--plots follows the VOC detection protocol; ignored "
                  "for segmentation eval")
        from tpucv.data.loader import Loader, segmentation_collate
        from tpucv.data.segmentation_dataset import SegmentationDataset
        loader = Loader(
            SegmentationDataset(samples, self.cfg.arch.crop_size,
                                train=False),
            batch_size, shuffle=False, collate=segmentation_collate)
        return self.evaluate_on_voc(variables, loader, **kw)

    def evaluate_on_voc(self, variables, loader, **_) -> Dict[str, float]:
        """Batched mIoU eval over a segmentation Loader."""
        infer = self.make_infer_fn()
        metrics = SegmentationMetrics(self.nc, self.cfg.loss.ignore_index)
        for batch in loader:
            pred = jax.device_get(
                infer(variables, jnp.asarray(batch["images"])))
            metrics.update(pred, batch["labels"])
        out = metrics.compute()
        print({k: v for k, v in out.items() if k != "per_class_iou"})
        return out
