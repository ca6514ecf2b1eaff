"""YOLOv8-cls trainer — classification on the CSPDarknet backbone.

Reuses the ``vit_cls`` trainer wholesale (folder-per-class or synthetic
data, CE loss, val top-1 eval loop); only the algorithm differs.  The
reference ships the yolov8-cls spec but no trainer for it."""

from __future__ import annotations

from tpucv.registry import trainer_registry
from tpucv.trainer.vit_train import VitClsTrainer


@trainer_registry("yolo8_cls")
class Yolo8ClsTrainer(VitClsTrainer):
    def set_model_algorithm(self):
        from tpucv.algorithms.yolov8_cls import YOLOv8Cls
        self.algorithm = YOLOv8Cls(self.cfg)
