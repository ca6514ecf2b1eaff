from tpucv.models.yolov8 import (  # noqa: F401
    Yolo8,
    build_yolo8,
    get_yolo8_n,
    get_yolo8_s,
    get_yolo8_m,
    get_yolo8_l,
    get_yolo8_x,
)
