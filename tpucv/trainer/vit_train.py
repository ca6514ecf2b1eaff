"""ViT classification trainer — 6th registered family (the reference stubs
ViT with an empty file and has no classification task at all).

Data: torchvision-style folder-per-class tree at ``TPUCV_CLS_ROOT``
(``root/{train,val}/<class>/*.jpg``); synthetic fallback otherwise.
Eval loop reports val loss + top-1 accuracy."""

from __future__ import annotations

import os
from typing import Dict

import jax
import numpy as np

from tpucv.data.classification_dataset import (
    ClassificationDataset, ImageFolderIndex, SyntheticClsIndex,
    classification_collate)
from tpucv.data.loader import Loader
from tpucv.registry import trainer_registry
from tpucv.trainer.base import BaseTrainer, MeanMetric
from tpucv.train.state import make_eval_step


@trainer_registry("vit_cls")
class VitClsTrainer(BaseTrainer):
    def set_model_algorithm(self):
        from tpucv.algorithms.classification import VitClassification
        self.algorithm = VitClassification(self.cfg)

    def load_data(self):
        cfg = self.cfg
        root = os.environ.get("TPUCV_CLS_ROOT", "")
        s = cfg.dataset.input_size
        if root and os.path.isdir(os.path.join(root, "train")):
            train_idx = ImageFolderIndex(root, "train")
            val_idx = ImageFolderIndex(root, "val",
                                       classes=train_idx.classes)
            cfg.n_classes = len(train_idx.classes)
            self.algorithm.nc = cfg.n_classes
            self.algorithm.class_names = list(train_idx.classes)
        else:
            print(f"TPUCV_CLS_ROOT {root!r} not found — using synthetic "
                  f"classification data")
            nc = cfg.num_classes
            train_idx = SyntheticClsIndex(64, s, nc, seed=0)
            val_idx = SyntheticClsIndex(16, s, nc, seed=1)
        self.val_index = val_idx
        nw = getattr(cfg.dataset, "num_workers", 0)
        self.train_loader = Loader(
            ClassificationDataset(train_idx, s, train=True),
            cfg.train.batch_size, shuffle=True,
            collate=classification_collate, num_workers=nw)
        self.val_loader = Loader(
            ClassificationDataset(val_idx, s, train=False),
            cfg.train.batch_size, shuffle=False,
            collate=classification_collate, num_workers=nw)

    def evaluate_loop(self, state) -> Dict[str, float]:
        eval_step = getattr(self, "_eval_step", None)
        if eval_step is None:
            self._eval_step = eval_step = make_eval_step(
                self.model.apply, self.loss_fn)
        acc: Dict[str, MeanMetric] = {}
        for batch in self.val_loader:
            metrics = jax.device_get(
                eval_step(state, self.device_batch(batch)))
            for k, v in metrics.items():
                acc.setdefault(k, MeanMetric()).update(float(v))
        return {f"val_{k}": m.result() for k, m in acc.items()}
