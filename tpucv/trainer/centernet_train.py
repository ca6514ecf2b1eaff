"""CenterNet trainer (reference ``core/trainer/centernet_train.py:21-135``)."""

from __future__ import annotations

from tpucv.registry import trainer_registry
from tpucv.trainer.base import BaseTrainer
from tpucv.trainer.data_helpers import build_detection_loaders


@trainer_registry("centernet")
class CenterNetTrainer(BaseTrainer):
    def set_model_algorithm(self):
        from tpucv.algorithms.centernet import CenterNetA
        self.algorithm = CenterNetA(self.cfg)

    def load_data(self):
        self.train_loader, self.val_loader, self.val_index = \
            build_detection_loaders(self.cfg)
