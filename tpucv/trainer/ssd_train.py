"""SSD trainer (reference ``core/trainer/ssd_train.py:21-131``). No collate
partials — targets assign in-graph inside the loss."""

from __future__ import annotations

from tpucv.registry import trainer_registry
from tpucv.trainer.base import BaseTrainer
from tpucv.trainer.data_helpers import build_detection_loaders


@trainer_registry("ssd")
class SsdTrainer(BaseTrainer):
    def set_model_algorithm(self):
        from tpucv.algorithms.ssd import Ssd
        self.algorithm = Ssd(self.cfg)

    def load_data(self):
        self.train_loader, self.val_loader, self.val_index = \
            build_detection_loaders(self.cfg)
