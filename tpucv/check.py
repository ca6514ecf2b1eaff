"""Model-name whitelist (reference ``check.py:1-14``)."""

MODELS = ["yolo7", "yolo8_det", "ssd", "centernet", "deeplabv3plus"]


def check_model_name(name: str) -> None:
    if name not in MODELS:
        raise ValueError(
            f"unknown model {name!r}; valid names: {MODELS}")
