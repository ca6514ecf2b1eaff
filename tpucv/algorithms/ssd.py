"""SSD algorithm façade (reference ``core/algorithms/ssd.py:25-541``).

Key TPU-first shift: GT encoding runs *in-graph* (vmapped
``assign_ssd_targets_batch``) inside the loss, instead of per-sample numpy in
DataLoader collate workers (the reference's hottest CPU path, SURVEY §3.5).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tpucv.algorithms.base import DetectionAlgorithm
from tpucv.decode.ssd import decode_ssd
from tpucv.losses.multibox import multibox_loss
from tpucv.models.ssd import SSD
from tpucv.ops.anchors import generate_ssd_anchors
from tpucv.ops.preprocess import normalize_images
from tpucv.registry import model_registry
from tpucv.targets.ssd import assign_ssd_targets_batch


@model_registry("ssd")
class Ssd(DetectionAlgorithm):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.nc = cfg.num_classes            # includes background
        t = cfg.arch.tables
        self.priors = generate_ssd_anchors(
            cfg.arch.input_size, t["feature_shapes"], t["anchor_sizes"],
            t["aspect_ratios"])

    @property
    def init_size(self) -> int:
        # SSD's extra-layer geometry is locked to 300/512
        return self.cfg.arch.input_size

    def build_model(self) -> SSD:
        return SSD(num_classes=self.nc, input_size=self.cfg.arch.input_size,
                   dtype=self.dtype)

    def build_loss(self):
        l = self.cfg.loss
        priors = self.priors
        size = float(self.cfg.arch.input_size)
        variances = self.cfg.arch.variances

        def loss_fn(raw, batch):
            loc_pred, conf_pred = raw
            gt_boxes = batch["gt_bboxes"] / size      # normalise to [0,1]
            loc_t, cls_t, pos = assign_ssd_targets_batch(
                gt_boxes, batch["gt_labels"], batch["gt_mask"], priors,
                l.overlap_threshold, variances)
            return multibox_loss(
                loc_pred, conf_pred, loc_t, cls_t, pos,
                neg_pos_ratio=l.neg_pos_ratio, alpha=l.alpha)

        return loss_fn

    def make_infer_fn(self, model=None, conf_threshold: Optional[float] = None):
        model = model or self.build_model()
        d = self.cfg.decode
        conf = d.conf_threshold if conf_threshold is None else conf_threshold
        priors = self.priors
        size = self.cfg.arch.input_size
        variances = self.cfg.arch.variances

        @jax.jit
        def infer(variables, images_u8):
            x = normalize_images(images_u8, self.dtype)
            loc, cf = model.apply(variables, x)
            return decode_ssd(
                loc, cf, priors, size, conf, d.iou_threshold, d.max_det,
                d.pre_nms_topk, variances)

        return infer
