"""Host-side image IO + letterbox geometry.

Parity with reference ``core/utils/image_process.py`` (read_image :7-27,
letter_box :48-66, reverse_letter_box :69-129) — but the device-side resize/
normalise lives in ``tpucv.ops.preprocess`` so the hot path stays on-chip.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover - cv2 is present in this image
    cv2 = None


def read_image(path: str) -> np.ndarray:
    """Decode an image file to RGB uint8 HWC (EXIF ignored like the
    reference's cv2.IMREAD_IGNORE_ORIENTATION usage).

    JPEGs take the native path (tpucv/native/imagepipe.cpp — libjpeg
    straight to RGB, bit-identical to cv2 decode+convert and ~8% faster
    single-core); anything it can't handle (PNG, CMYK, corrupt) falls back
    to cv2."""
    path = str(path)
    ext = os.path.splitext(path)[1].lower()
    if ext in (".jpg", ".jpeg"):        # don't double-read non-JPEG files
        from tpucv.native import imagepipe
        img = imagepipe.decode_jpeg(path)
        if img is not None:
            return img
    img = cv2.imread(str(path), cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION)
    if img is None:
        raise FileNotFoundError(f"could not read image: {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def letter_box(
    image: np.ndarray, size: Tuple[int, int], fill: int = 128
) -> Tuple[np.ndarray, float, Tuple[int, int]]:
    """Aspect-preserving resize onto a (H, W) canvas padded with ``fill``
    (reference image_process.py:48-66; pads are centred).

    Returns (canvas uint8, scale, (pad_x, pad_y)).
    """
    h, w = image.shape[:2]
    H, W = size
    scale = min(W / w, H / h)
    # INTER_NEAREST + int() truncation: exactly the reference
    # (image_process.py:57-59) and the on-device letterbox_images — train,
    # predict, and eval all see the same resampling
    nw, nh = int(w * scale), int(h * scale)
    resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_NEAREST)
    canvas = np.full((H, W, 3), fill, dtype=image.dtype)
    px, py = (W - nw) // 2, (H - nh) // 2
    canvas[py:py + nh, px:px + nw] = resized
    return canvas, scale, (px, py)


def reverse_letter_box(
    boxes: np.ndarray, scale, pad: Tuple[int, int],
    orig_shape: Tuple[int, int], clip: bool = True,
) -> np.ndarray:
    """Map xyxy boxes from letterboxed-input pixels back to original-image
    pixels (reference image_process.py:69-129). ``scale`` is a scalar or an
    (sx, sy) pair — per-axis when a host pre-shrink applied slightly
    different effective ratios per axis (int truncation).

    ``clip=False`` reproduces the reference exactly: its reverse mapping
    never clips to the image (image_process.py:69-97), so boxes can extend
    past the borders and score LOWER IoU against in-image GT. The eval
    harnesses pass clip=False so published numbers follow the reference
    protocol; predict/visualize keep the (strictly saner) clipped boxes."""
    px, py = pad
    sx, sy = scale if isinstance(scale, (tuple, list)) else (scale, scale)
    out = boxes.astype(np.float32).copy()
    out[..., [0, 2]] = (out[..., [0, 2]] - px) / sx
    out[..., [1, 3]] = (out[..., [1, 3]] - py) / sy
    if clip:
        h, w = orig_shape
        out[..., [0, 2]] = out[..., [0, 2]].clip(0, w)
        out[..., [1, 3]] = out[..., [1, 3]].clip(0, h)
    return out
