"""Image-classification algorithm (ViT) — a full pipeline for the model the
reference only stubbed (``core/models/vit.py``: 0 LoC; no classification
task exists anywhere in the reference). Same façade contract as the other
algorithms: build_model / build_loss / make_infer_fn / predict / evaluate.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tpucv.algorithms.base import init_on_cpu
from tpucv.models.vit import ViT
from tpucv.ops.preprocess import normalize_images
from tpucv.registry import model_registry


@model_registry("vit_cls")
class VitClassification:
    def __init__(self, cfg):
        self.cfg = cfg
        self.nc = cfg.num_classes
        self.input_size = cfg.dataset.input_size
        self.dtype = jnp.bfloat16 if cfg.train.mixed_precision \
            else jnp.float32
        self.class_names = [f"c{i}" for i in range(self.nc)]

    def build_model(self) -> ViT:
        a = self.cfg.arch
        return ViT(num_classes=self.nc, patch=a.patch, dim=a.dim,
                   depth=a.depth, heads=a.heads, dtype=self.dtype)

    def init_variables(self, model=None, seed: int = 0):
        model = model or self.build_model()
        s = self.input_size     # ViT pos-embed is size-locked: init at full
        return init_on_cpu(model, (1, s, s, 3), self.dtype, seed)

    def build_loss(self):
        smoothing = self.cfg.loss.label_smoothing
        nc = self.nc

        def loss_fn(logits, batch):
            labels = batch["labels"]
            onehot = jax.nn.one_hot(labels, nc)
            soft = onehot * (1 - smoothing) + smoothing / nc
            ce = optax.softmax_cross_entropy(
                logits.astype(jnp.float32), soft).mean()
            acc = (jnp.argmax(logits, -1) == labels).mean(dtype=jnp.float32)
            return ce, {"acc": acc}

        return loss_fn

    def make_infer_fn(self, model=None, conf_threshold: Optional[float] = None):
        model = model or self.build_model()

        @jax.jit
        def infer(variables, images_u8):
            x = normalize_images(images_u8, self.dtype)
            logits = model.apply(variables, x)
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        return infer

    def make_predict_infer_fn(self, model=None,
                              conf_threshold: Optional[float] = None):
        """Predict-CLI contract (same as eval here: softmax probs)."""
        return self.make_infer_fn(model, conf_threshold)

    # ------------------------------------------------------------- predict
    def predict(self, variables, image_path: str, infer_fn=None,
                save_dir: Optional[str] = None, topk: int = 5):
        import cv2
        from tpucv.utils.image_process import read_image

        from tpucv.algorithms.base import cached_infer
        infer_fn = infer_fn or cached_infer(
            self, "predict", self.make_infer_fn)
        img = read_image(image_path) if isinstance(image_path, str) \
            else image_path
        s = self.input_size
        canvas = cv2.resize(img, (s, s), interpolation=cv2.INTER_LINEAR)
        probs = np.asarray(jax.device_get(
            infer_fn(variables, jnp.asarray(canvas[None]))))[0]
        k = min(topk, self.nc)
        top = np.argsort(-probs)[:k]
        result = {
            "classes": top,
            "scores": probs[top],
            "labels": [self.class_names[int(i)] for i in top],
            "boxes": np.zeros((0, 4), np.float32),   # CLI summary contract
            "saved": None,
        }
        for i in top:
            print(f"  {self.class_names[int(i)]:>12s}: {probs[int(i)]:.4f}")
        return result

    # ------------------------------------------------------------ evaluate
    def build_eval_index(self, subset: str = "val"):
        """ImageFolder index under $TPUCV_CLS_ROOT (classes pinned to the
        TRAIN split's listing — what the checkpoint's logits mean; a val
        tree with the same class count but different names would otherwise
        silently score images against the wrong logit), synthetic data
        otherwise (evaluate-CLI contract, see base.build_eval_index)."""
        import os
        from tpucv.data.classification_dataset import (ImageFolderIndex,
                                                       SyntheticClsIndex)
        root = os.environ.get("TPUCV_CLS_ROOT", "")
        if root and os.path.isdir(os.path.join(root, subset)):
            classes = None
            if os.path.isdir(os.path.join(root, "train")):
                classes = ImageFolderIndex(root, "train").classes
            index = ImageFolderIndex(root, subset, classes=classes)
            if len(index.classes) != self.nc:
                raise SystemExit(
                    f"folder tree has {len(index.classes)} classes but the "
                    f"config (and checkpoint) use {self.nc}; set "
                    f"n_classes to match the dataset")
            self.class_names = list(index.classes)
            return index
        print(f"TPUCV_CLS_ROOT {root!r} not found — synthetic data")
        return SyntheticClsIndex(32, self.input_size, self.nc, seed=1)

    def run_eval(self, variables, index, batch_size: int = 64,
                 plots: bool = False, **kw):
        if plots:
            print("--plots follows the VOC protocol; ignored for "
                  "classification eval")
        return self.evaluate(variables, index, batch_size, **kw)

    def evaluate(self, variables, index, batch_size: int = 64,
                 verbose: bool = True) -> Dict[str, float]:
        """Top-1 / top-5 accuracy over an (image, label) index, batched."""
        import cv2

        infer = self.make_infer_fn()
        s = self.input_size
        n = len(index)
        top1 = top5 = 0
        for start in range(0, n, batch_size):
            idxs = range(start, min(start + batch_size, n))
            imgs = np.zeros((batch_size, s, s, 3), np.uint8)
            labels = np.zeros(batch_size, np.int64)
            for j, i in enumerate(idxs):
                item = index[i]
                img = item[0]
                if isinstance(img, str):
                    from tpucv.utils.image_process import read_image
                    img = read_image(img)
                if img.shape[:2] != (s, s):
                    img = cv2.resize(img, (s, s),
                                     interpolation=cv2.INTER_LINEAR)
                imgs[j] = img
                labels[j] = item[1]
            probs = np.asarray(jax.device_get(
                infer(variables, jnp.asarray(imgs))))
            k = min(5, self.nc)
            topk_idx = np.argsort(-probs, axis=-1)[:, :k]
            for j, i in enumerate(idxs):
                top1 += int(topk_idx[j, 0] == labels[j])
                top5 += int(labels[j] in topk_idx[j])
        res = {"top1": top1 / max(n, 1), "top5": top5 / max(n, 1)}
        if verbose:
            print(f"top-1 {res['top1'] * 100:.2f}%  "
                  f"top-5 {res['top5'] * 100:.2f}%  ({n} images)")
        return res
