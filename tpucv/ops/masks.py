"""Instance-mask ops (reference ``core/utils/ultralytics_ops.py`` mask region
:540-651: crop_mask / process_mask / scale_image) — static-shape jnp."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def crop_mask(masks: jax.Array, boxes: jax.Array) -> jax.Array:
    """Zero mask pixels outside each box.

    masks: (N, H, W); boxes: (N, 4) xyxy in mask pixels.
    """
    n, h, w = masks.shape
    x1, y1, x2, y2 = jnp.split(boxes[:, :, None], 4, axis=1)  # (N,1,1)
    c = jnp.arange(w, dtype=boxes.dtype)[None, None, :]
    r = jnp.arange(h, dtype=boxes.dtype)[None, :, None]
    keep = (c >= x1) & (c < x2) & (r >= y1) & (r < y2)
    return masks * keep


def process_mask(
    protos: jax.Array,        # (Hp, Wp, n_masks)
    coefs: jax.Array,         # (N, n_masks)
    boxes: jax.Array,         # (N, 4) xyxy in input pixels
    input_hw,
    upsample: bool = False,
) -> jax.Array:
    """Combine prototypes with per-detection coefficients
    (reference process_mask): sigmoid(coefs @ protos), crop to boxes."""
    hp, wp, nm = protos.shape
    masks = jax.nn.sigmoid(
        jnp.einsum("nm,hwm->nhw", coefs.astype(jnp.float32),
                   protos.astype(jnp.float32)))
    ih, iw = input_hw
    scale = jnp.asarray([wp / iw, hp / ih, wp / iw, hp / ih], masks.dtype)
    masks = crop_mask(masks, boxes * scale)
    if upsample:
        masks = jax.image.resize(masks, (masks.shape[0], ih, iw), "bilinear")
    return masks


def process_mask_upsample(protos, coefs, boxes, input_hw):
    """Reference process_mask_upsample (ultralytics_ops.py:558-577):
    upsample the combined prototypes to input resolution FIRST, then crop
    at full resolution (sharper edges than the crop-then-upsample fast
    path)."""
    masks = jax.nn.sigmoid(
        jnp.einsum("nm,hwm->nhw", coefs.astype(jnp.float32),
                   protos.astype(jnp.float32)))
    ih, iw = input_hw
    masks = jax.image.resize(masks, (masks.shape[0], ih, iw), "bilinear")
    return crop_mask(masks, boxes)


def process_mask_native(protos, coefs, boxes, dst_hw, input_hw=None):
    """Reference process_mask_native (ultralytics_ops.py:611-635): combine
    prototypes, undo the letterbox (crop the pad, resize to the original
    image), then crop to boxes given in ORIGINAL-image pixels."""
    hp, wp, _ = protos.shape
    masks = jax.nn.sigmoid(
        jnp.einsum("nm,hwm->nhw", coefs.astype(jnp.float32),
                   protos.astype(jnp.float32)))
    dh, dw = dst_hw
    gain = min(hp / dh, wp / dw)
    ph, pw = hp - dh * gain, wp - dw * gain      # total pad at proto scale
    # reference convention exactly (ultralytics_ops.py:627-629): plain int
    # truncation on both edges — at odd total pads this differs from the
    # newer round(±0.1) ultralytics variant by one row/col
    top, left = int(ph / 2), int(pw / 2)
    bottom, right = int(hp - ph / 2), int(wp - pw / 2)
    masks = masks[:, top:bottom, left:right]
    masks = jax.image.resize(masks, (masks.shape[0], dh, dw), "bilinear")
    return crop_mask(masks, boxes)


def scale_image(masks, im0_shape, ratio_pad=None):
    """Undo the letterbox on a full-resolution mask/image array
    (ultralytics_ops.py:305-341): crop the pad, resize to im0. Host-side
    (numpy + cv2) — this runs on final visualisation output."""
    import cv2
    import numpy as np

    masks = np.asarray(masks)
    im1_shape = masks.shape
    if im1_shape[:2] == tuple(im0_shape[:2]):
        return masks
    if ratio_pad is None:
        gain = min(im1_shape[0] / im0_shape[0], im1_shape[1] / im0_shape[1])
        pad = ((im1_shape[1] - im0_shape[1] * gain) / 2,
               (im1_shape[0] - im0_shape[0] * gain) / 2)
    else:
        pad = ratio_pad[1]
    top, left = int(pad[1]), int(pad[0])
    bottom, right = int(im1_shape[0] - pad[1]), int(im1_shape[1] - pad[0])
    masks = masks[top:bottom, left:right]
    return cv2.resize(masks, (im0_shape[1], im0_shape[0]))


def masks2segments(masks, strategy: str = "largest"):
    """Binary masks (N, H, W) -> list of (K, 2) float32 contours
    (ultralytics_ops.py:669-692). Host-side cv2.findContours; strategy
    'largest' keeps the biggest contour, 'concat' joins all."""
    import cv2
    import numpy as np

    segments = []
    for m in np.asarray(masks).astype(np.uint8):
        contours = cv2.findContours(m, cv2.RETR_EXTERNAL,
                                    cv2.CHAIN_APPROX_SIMPLE)[0]
        if contours:
            if strategy == "concat":
                c = np.concatenate([c.reshape(-1, 2) for c in contours])
            else:
                c = max(contours, key=len).reshape(-1, 2)
        else:
            c = np.zeros((0, 2))
        segments.append(c.astype(np.float32))
    return segments
