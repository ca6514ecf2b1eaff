"""Algorithm façades — per-model bundles of build_model / build_loss /
predict / decode / evaluate, mirroring the reference's
``core/algorithms/*`` public surface (SURVEY.md §1.5)."""

from tpucv.algorithms.yolov8 import YOLOv8  # noqa: F401
