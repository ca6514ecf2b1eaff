"""Segmentation metrics via confusion matrix — jnp port of the reference
``SegmentationMetrics`` (``core/metrics/seg_metrics.py:4-38``): overall acc,
mean per-class acc, frequency-weighted acc, mIoU, per-class IoU. The histogram
is a jit-able bincount so eval can run fully on-device."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(pred: jax.Array, label: jax.Array, num_classes: int,
                     ignore_index: int = 255) -> jax.Array:
    """(... ) int arrays -> (C, C) histogram; entries with label==ignore are
    dropped."""
    valid = (label >= 0) & (label < num_classes) & (label != ignore_index)
    idx = num_classes * jnp.where(valid, label, 0) + jnp.clip(pred, 0, num_classes - 1)
    hist = jnp.bincount(
        idx.reshape(-1), weights=valid.reshape(-1).astype(jnp.float32),
        length=num_classes * num_classes)
    return hist.reshape(num_classes, num_classes)


class SegmentationMetrics:
    def __init__(self, num_classes: int, ignore_index: int = 255):
        self.nc = num_classes
        self.ignore_index = ignore_index
        self.hist = np.zeros((num_classes, num_classes), np.float64)

    def update(self, pred, label):
        self.hist += np.asarray(
            confusion_matrix(jnp.asarray(pred), jnp.asarray(label), self.nc,
                             self.ignore_index))

    def reset(self):
        self.hist[:] = 0

    def compute(self) -> Dict[str, float]:
        h = self.hist
        eps = 1e-9
        acc = np.diag(h).sum() / (h.sum() + eps)
        # absent classes (no GT and no prediction) are NaN, excluded by
        # nanmean — reference semantics (seg_metrics.py:20-33); an eps-forced
        # 0 would deflate mIoU on splits missing classes
        with np.errstate(divide="ignore", invalid="ignore"):
            acc_cls = np.diag(h) / h.sum(axis=1)
            denom = h.sum(axis=1) + h.sum(axis=0) - np.diag(h)
            iou = np.where(denom > 0, np.diag(h) / np.where(denom > 0, denom, 1),
                           np.nan)
        freq = h.sum(axis=1) / (h.sum() + eps)
        valid = (freq > 0) & np.isfinite(iou)
        fwavacc = (freq[valid] * iou[valid]).sum()
        return {
            "overall_acc": float(acc),
            "mean_acc": float(np.nanmean(acc_cls)),
            "freq_weighted_acc": float(fwavacc),
            "mIoU": float(np.nanmean(iou)),
            "per_class_iou": iou.tolist(),
        }
