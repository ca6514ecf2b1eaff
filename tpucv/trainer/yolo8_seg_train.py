"""YOLOv8-seg trainer — instance segmentation (no reference counterpart).

Data: COCO with polygon segmentations when the root exists (rasterised via
cv2.fillPoly, no pycocotools), synthetic rectangles (mask == box) otherwise.
The seg path uses plain-resize batches (no mosaic) so masks stay aligned.
"""

from __future__ import annotations

import os

from tpucv.configs.dataset_cfg import get_dataset_cfg
from tpucv.data.detection_dataset import SyntheticDetectionIndex
from tpucv.data.instance_seg_dataset import (
    InstanceSegDataset, instance_seg_collate)
from tpucv.data.loader import Loader
from tpucv.registry import trainer_registry
from tpucv.trainer.base import BaseTrainer


@trainer_registry("yolo8_seg")
class Yolo8SegTrainer(BaseTrainer):
    LOSS_BATCH_SCALED = True    # det total and mask term both scale by B

    def set_model_algorithm(self):
        from tpucv.algorithms.yolov8_seg import YOLOv8Seg
        self.algorithm = YOLOv8Seg(self.cfg)

    def load_data(self):
        cfg = self.cfg
        ds_cfg = get_dataset_cfg(cfg.dataset.name)
        root = ds_cfg["root"]
        ann = os.path.join(root, "annotations/instances_%s2017.json")
        if cfg.dataset.name == "coco" and all(
                os.path.isfile(ann % s) for s in ("train", "val")):
            from tpucv.data.coco import COCOIndex
            train_idx = COCOIndex(ann % "train",
                                  os.path.join(root, "train2017"),
                                  keep_polys=True)
            val_idx = COCOIndex(ann % "val", os.path.join(root, "val2017"),
                                keep_polys=True)
        else:
            print(f"dataset root {root!r} not found — using synthetic "
                  f"instance-seg data (mask == box rectangles)")
            s = cfg.dataset.input_size
            nc = ds_cfg["num_classes"]
            train_idx = SyntheticDetectionIndex(64, s, nc, seed=0)
            val_idx = SyntheticDetectionIndex(16, s, nc, seed=1)
        self.val_index = val_idx
        nw = getattr(cfg.dataset, "num_workers", 0)
        t = cfg.train
        self.train_loader = Loader(
            InstanceSegDataset(train_idx, cfg.dataset.input_size,
                               cfg.dataset.max_num_boxes, train=True),
            t.batch_size, shuffle=True, collate=instance_seg_collate,
            num_workers=nw)
        self.val_loader = Loader(
            InstanceSegDataset(val_idx, cfg.dataset.input_size,
                               cfg.dataset.max_num_boxes, train=False),
            t.batch_size, shuffle=False, collate=instance_seg_collate,
            num_workers=nw)

    def device_batch(self, batch, train: bool = False):
        # the seg batch carries gt_inst_masks which the on-device affine
        # augment does not transform — force the plain normalize path
        batch = dict(batch)
        saved = getattr(self.cfg.train, "device_aug", False)
        self.cfg.train.device_aug = False
        try:
            return super().device_batch(batch, train=train)
        finally:
            self.cfg.train.device_aug = saved
