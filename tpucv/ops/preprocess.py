"""On-device preprocessing.

The reference normalises on CPU inside Dataset workers; here uint8 batches are
shipped to the device once and everything else (scale, cast, future: HSV /
affine) runs on-chip, fused by XLA into the first conv — the BASELINE.json
north-star "JPEG -> boxes never leaves the chip after host decode".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_images(images_u8: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """uint8 NHWC -> dtype in [0, 1] (reference divides by 255.0)."""
    return images_u8.astype(dtype) / jnp.asarray(255.0, dtype)


def imagenet_normalize(images: jax.Array) -> jax.Array:
    """ImageNet mean/std normalisation (segmentation path parity:
    core/data/segmentation_dataset.py transform stack)."""
    mean = jnp.asarray([0.485, 0.456, 0.406], images.dtype)
    std = jnp.asarray([0.229, 0.224, 0.225], images.dtype)
    return (images - mean) / std


def letterbox_images(
    canvases_u8: jax.Array,     # (B, Hc, Wc, 3) uint8, image at top-left
    hw: jax.Array,              # (B, 2) int32 actual (h, w) per image
    out_size: int,
    fill: int = 128,
    method: str = "nearest",
):
    """On-device batched letterbox: aspect-preserving resize of each valid
    (h, w) region onto a (out_size, out_size) canvas, centred, padded with
    ``fill`` — the device-side replacement for the reference's per-image
    host cv2 ``letter_box`` (core/utils/image_process.py:48-66; it uses
    INTER_NEAREST, which ``method="nearest"`` matches exactly).

    Returns (canvas uint8 (B, S, S, 3), scale (B,) f32, pad_xy (B, 2) f32)
    — same contract as the host ``tpucv.utils.image_process.letter_box``.

    "nearest" is a pure uint8 gather (bandwidth-trivial); "linear" goes
    through jax.image.scale_and_translate (MXU einsums, ~GFLOPs/img).
    """
    S = out_size

    def one(img, hw1):
        h = hw1[0].astype(jnp.float32)
        w = hw1[1].astype(jnp.float32)
        scale = jnp.minimum(S / h, S / w)
        nh = jnp.floor(h * scale)          # int(h*scale) truncation, ref :57
        nw = jnp.floor(w * scale)
        top = jnp.floor((S - nh) / 2)
        left = jnp.floor((S - nw) / 2)
        yy = jnp.arange(S, dtype=jnp.float32)
        xx = jnp.arange(S, dtype=jnp.float32)
        in_y = (yy >= top) & (yy < top + nh)
        in_x = (xx >= left) & (xx < left + nw)
        if method == "nearest":
            # cv2 INTER_NEAREST: src = floor(dst * src_len / dst_len)
            sy = jnp.clip(jnp.floor((yy - top) * h / nh), 0,
                          h - 1).astype(jnp.int32)
            sx = jnp.clip(jnp.floor((xx - left) * w / nw), 0,
                          w - 1).astype(jnp.int32)
            out = jnp.take(jnp.take(img, sy, axis=0), sx, axis=1)
        else:
            out = jax.image.scale_and_translate(
                img.astype(jnp.float32), (S, S, 3), (0, 1),
                jnp.stack([scale, scale]), jnp.stack([top, left]),
                method="linear", antialias=False)
            out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
        inside = (in_y[:, None] & in_x[None, :])[..., None]
        out = jnp.where(inside, out, jnp.uint8(fill))
        return out, scale, jnp.stack([left, top])

    outs, scales, pads = jax.vmap(one)(canvases_u8, hw)
    return outs, scales, pads


def letterbox_static(raw_u8: jax.Array, out_size: int, fill: int = 128):
    """Letterbox for a batch whose images share one natural (h, w) with
    max(h, w) == out_size — true of every standard COCO val2017 image at
    640, where the reference's resize (scale = 1) is the identity and
    letterboxing reduces to one centring pad. XLA fuses the pad into the
    following normalise/conv, so this path is ~free (vs the general
    dynamic-size ``letterbox_images``).

    Returns (canvas uint8 (B, S, S, 3), scale=1.0, (pad_x, pad_y))."""
    B, h, w, _ = raw_u8.shape
    S = out_size
    if max(h, w) != S:
        raise ValueError(
            f"letterbox_static requires max(h,w)=={S}, got {(h, w)}; "
            f"use letterbox_images for the general case")
    py, px = (S - h) // 2, (S - w) // 2
    canvas = jnp.pad(
        raw_u8, ((0, 0), (py, S - h - py), (px, S - w - px), (0, 0)),
        constant_values=fill)
    return canvas, 1.0, (px, py)
