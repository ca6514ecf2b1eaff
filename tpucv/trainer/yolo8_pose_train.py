"""YOLOv8-pose trainer (no reference counterpart). Data: COCO
person_keypoints json when present, synthetic keypointed rectangles
otherwise; plain-resize batches (keypoints scale linearly)."""

from __future__ import annotations

import os

from tpucv.configs.dataset_cfg import get_dataset_cfg
from tpucv.data.loader import Loader
from tpucv.data.pose_dataset import (
    COCOKeypointIndex, PoseDataset, SyntheticPoseIndex, pose_collate)
from tpucv.registry import trainer_registry
from tpucv.trainer.base import BaseTrainer


@trainer_registry("yolo8_pose")
class Yolo8PoseTrainer(BaseTrainer):
    LOSS_BATCH_SCALED = True    # det total and kpt terms both scale by B

    def set_model_algorithm(self):
        from tpucv.algorithms.yolov8_pose import YOLOv8Pose
        self.algorithm = YOLOv8Pose(self.cfg)

    def load_data(self):
        cfg = self.cfg
        root = get_dataset_cfg("coco")["root"]
        nk = cfg.arch.kpt_shape[0]
        ann = os.path.join(root, "annotations/person_keypoints_%s2017.json")
        if all(os.path.isfile(ann % s) for s in ("train", "val")):
            train_idx = COCOKeypointIndex(
                ann % "train", os.path.join(root, "train2017"))
            val_idx = COCOKeypointIndex(
                ann % "val", os.path.join(root, "val2017"))
        else:
            print(f"person_keypoints not found under {root!r} — using "
                  f"synthetic pose data")
            s = cfg.dataset.input_size
            train_idx = SyntheticPoseIndex(64, s, nk, seed=0)
            val_idx = SyntheticPoseIndex(16, s, nk, seed=1)
        self.val_index = val_idx
        nw = getattr(cfg.dataset, "num_workers", 0)
        t = cfg.train
        self.train_loader = Loader(
            PoseDataset(train_idx, cfg.dataset.input_size,
                        cfg.dataset.max_num_boxes, nk=nk, train=True),
            t.batch_size, shuffle=True, collate=pose_collate, num_workers=nw)
        self.val_loader = Loader(
            PoseDataset(val_idx, cfg.dataset.input_size,
                        cfg.dataset.max_num_boxes, nk=nk, train=False),
            t.batch_size, shuffle=False, collate=pose_collate,
            num_workers=nw)

    def device_batch(self, batch, train: bool = False):
        # gt_kpts are not transformed by the on-device affine augment —
        # force the plain normalize path (same policy as the seg trainer)
        saved = getattr(self.cfg.train, "device_aug", False)
        self.cfg.train.device_aug = False
        try:
            return super().device_batch(dict(batch), train=train)
        finally:
            self.cfg.train.device_aug = saved
