from tpucv.trainer.base import BaseTrainer, MeanMetric  # noqa: F401
from tpucv.trainer.yolo8_train import Yolo8Trainer  # noqa: F401
from tpucv.trainer.ssd_train import SsdTrainer  # noqa: F401
from tpucv.trainer.centernet_train import CenterNetTrainer  # noqa: F401
from tpucv.trainer.segmentation_trainer import DeeplabV3PlusTrainer  # noqa: F401
from tpucv.trainer.yolo7_train import Yolo7Trainer  # noqa: F401
from tpucv.trainer.vit_train import VitClsTrainer  # noqa: F401
from tpucv.trainer.yolo8_seg_train import Yolo8SegTrainer  # noqa: F401
from tpucv.trainer.yolo8_pose_train import Yolo8PoseTrainer  # noqa: F401
from tpucv.trainer.yolo8_cls_train import Yolo8ClsTrainer  # noqa: F401
