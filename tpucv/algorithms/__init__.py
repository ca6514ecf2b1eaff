"""Algorithm façades — per-model bundles of build_model / build_loss /
predict / decode / evaluate, mirroring the reference's
``core/algorithms/*`` public surface (SURVEY.md §1.5)."""

from tpucv.algorithms.yolov8 import YOLOv8  # noqa: F401
from tpucv.algorithms.ssd import Ssd  # noqa: F401
from tpucv.algorithms.centernet import CenterNetA  # noqa: F401
from tpucv.algorithms.segmentation_2d import DeeplabV3PlusA  # noqa: F401
from tpucv.algorithms.yolov7 import YOLOv7 as Yolo7A  # noqa: F401
from tpucv.algorithms.classification import VitClassification  # noqa: F401
from tpucv.algorithms.yolov8_seg import YOLOv8Seg  # noqa: F401
from tpucv.algorithms.yolov8_pose import YOLOv8Pose  # noqa: F401
from tpucv.algorithms.yolov8_cls import YOLOv8Cls  # noqa: F401
