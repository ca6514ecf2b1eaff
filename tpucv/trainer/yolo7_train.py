"""YOLOv7 trainer (reference ``core/trainer/yolo7_train.py:20-114``)."""

from __future__ import annotations

from tpucv.registry import trainer_registry
from tpucv.trainer.base import BaseTrainer
from tpucv.trainer.data_helpers import build_detection_loaders


@trainer_registry("yolo7")
class Yolo7Trainer(BaseTrainer):
    def set_model_algorithm(self):
        from tpucv.algorithms.yolov7 import YOLOv7
        self.algorithm = YOLOv7(self.cfg)

    def load_data(self):
        self.train_loader, self.val_loader, self.val_index = \
            build_detection_loaders(self.cfg)
