from tpucv.trainer.base import BaseTrainer, MeanMetric  # noqa: F401
from tpucv.trainer.yolo8_train import Yolo8Trainer  # noqa: F401
