"""DeepLabV3+ trainer (reference ``core/trainer/segmentation_trainer.py:
21-158``): seg dataloaders (voc/sbd/cityscapes layout or synthetic fallback);
eval computes mIoU/acc via ``SegmentationMetrics``."""

from __future__ import annotations

import os
from typing import Dict

import jax
import numpy as np

from tpucv.configs.dataset_cfg import get_dataset_cfg
from tpucv.data.loader import Loader, segmentation_collate
from tpucv.data.segmentation_dataset import (
    SegmentationDataset, build_voc_seg_samples, synthetic_seg_samples)
from tpucv.metrics.seg_metrics import SegmentationMetrics
from tpucv.ops.preprocess import imagenet_normalize
from tpucv.registry import trainer_registry
from tpucv.trainer.base import BaseTrainer


@trainer_registry("deeplabv3plus")
class DeeplabV3PlusTrainer(BaseTrainer):
    def set_model_algorithm(self):
        from tpucv.algorithms.segmentation_2d import DeeplabV3PlusA
        self.algorithm = DeeplabV3PlusA(self.cfg)

    def load_data(self):
        cfg = self.cfg
        root = get_dataset_cfg("voc")["root"]
        crop = cfg.arch.crop_size
        if os.path.isdir(os.path.join(root, "SegmentationClass")):
            train_s = build_voc_seg_samples(root, "train")
            val_s = build_voc_seg_samples(root, "val")
        else:
            print(f"dataset root {root!r} not found — using synthetic seg data")
            train_s = synthetic_seg_samples(32, crop, cfg.num_classes, 0)
            val_s = synthetic_seg_samples(8, crop, cfg.num_classes, 1)
        nw = getattr(cfg.dataset, "num_workers", 0)
        self.train_loader = Loader(
            SegmentationDataset(train_s, crop, train=True),
            cfg.train.batch_size, shuffle=True, collate=segmentation_collate,
            num_workers=nw)
        self.val_loader = Loader(
            SegmentationDataset(val_s, crop, train=False),
            cfg.train.batch_size, shuffle=False, collate=segmentation_collate,
            num_workers=nw)

    def device_batch(self, batch, train: bool = False):
        out = super().device_batch(batch)  # seg keeps host-side aug
        out["images"] = imagenet_normalize(out["images"])
        return out

    def evaluate_loop(self, state) -> Dict[str, float]:
        """mIoU / acc on the val split (reference :109-158)."""
        import jax.numpy as jnp

        model = self.model
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        @jax.jit
        def predict(v, images):
            logits = model.apply(v, images)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        metrics = SegmentationMetrics(
            self.cfg.num_classes, self.cfg.loss.ignore_index)
        for batch in self.val_loader:
            db = self.device_batch(batch)
            pred = jax.device_get(predict(variables, db["images"]))
            metrics.update(pred, batch["labels"])
        out = metrics.compute()
        return {"val_mIoU": out["mIoU"], "val_acc": out["overall_acc"]}
