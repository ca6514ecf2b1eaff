"""Model-name whitelist (reference ``check.py:1-14``).

``vit_cls`` extends the reference's five names: the reference stubs ViT
with an empty file and has no classification task; tpucv registers a full
pipeline for it."""

MODELS = ["yolo7", "yolo8_det", "ssd", "centernet", "deeplabv3plus",
          "vit_cls", "yolo8_seg", "yolo8_pose", "yolo8_cls"]


def check_model_name(name: str) -> None:
    if name not in MODELS:
        raise ValueError(
            f"unknown model {name!r}; valid names: {MODELS}")
