"""CenterNet algorithm façade (reference ``core/algorithms/centernet.py:
26-338``). Gaussian targets build in-graph (vs the reference's collate-worker
numpy); decode is the jitted maxpool-peak + top-K path."""

from __future__ import annotations

from typing import Optional

import jax

from tpucv.algorithms.base import DetectionAlgorithm
from tpucv.decode.centernet import decode_centernet
from tpucv.losses.centernet import centernet_loss
from tpucv.models.centernet import CenterNet
from tpucv.ops.preprocess import normalize_images
from tpucv.registry import model_registry
from tpucv.targets.centernet import build_centernet_targets


@model_registry("centernet")
class CenterNetA(DetectionAlgorithm):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.nc = cfg.num_classes
        self.down = cfg.arch.downsample
        self.out_hw = (cfg.dataset.input_size // self.down,
                       cfg.dataset.input_size // self.down)

    def build_model(self) -> CenterNet:
        return CenterNet(num_classes=self.nc,
                         head_channels=self.cfg.arch.head_channels,
                         dtype=self.dtype)

    def build_loss(self):
        l = self.cfg.loss
        nc, out_hw, down = self.nc, self.out_hw, self.down

        def loss_fn(raw, batch):
            targets = build_centernet_targets(
                batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
                nc, out_hw, down)
            return centernet_loss(
                raw, targets, nc, l.hm_weight, l.wh_weight, l.off_weight)

        return loss_fn

    def make_infer_fn(self, model=None, conf_threshold: Optional[float] = None):
        model = model or self.build_model()
        d = self.cfg.decode
        conf = d.conf_threshold if conf_threshold is None else conf_threshold

        @jax.jit
        def infer(variables, images_u8):
            x = normalize_images(images_u8, self.dtype)
            out = model.apply(variables, x)
            return decode_centernet(
                out, self.nc, self.down, d.K, conf,
                d.use_diou_nms, d.iou_threshold)

        return infer
