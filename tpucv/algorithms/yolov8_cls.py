"""YOLOv8 image-classification algorithm (``yolo8_cls``).

The reference ships the yolov8-cls model spec
(``core/models/yolov8/yolov8-cls.yaml``) and the ``Classify`` head
(``core/models/yolov8/modules.py:509-528``) but builds no classification
pipeline for them; tpucv registers a full one.  The model is the
golden-verified CSPDarknet backbone (layers 0-8, no SPPF/FPN) with the
Classify head at 224^2; everything else (CE + smoothing loss, top-1/top-5
eval, predict) reuses the classification facade from ``vit_cls``.
"""

from __future__ import annotations

from tpucv.algorithms.base import init_on_cpu
from tpucv.algorithms.classification import VitClassification
from tpucv.models.yolov8 import Yolo8
from tpucv.registry import model_registry


@model_registry("yolo8_cls")
class YOLOv8Cls(VitClassification):
    def build_model(self) -> Yolo8:
        return Yolo8(scale=self.cfg.arch.model_type, nc=self.nc,
                     head="classify", dtype=self.dtype)

    def init_variables(self, model=None, seed: int = 0):
        model = model or self.build_model()
        s = self.input_size
        return init_on_cpu(model, (1, s, s, 3), self.dtype, seed)
