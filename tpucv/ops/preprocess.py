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


def host_letterbox_geom(hw: "object", out_size: int):
    """Exact letterbox geometry, computed on HOST in float64 — the same
    arithmetic as the reference host ``letter_box`` (python floats ==
    float64: scale = min(S/w, S/h), int-truncated new dims, //2 pads;
    core/utils/image_process.py:48-66).  Computing this inside the jitted
    program in f32 diverged by 1 px on ~6% of (h, w) pairs (code review
    r3), so the harnesses precompute it here and ship it with ``hw``.

    hw: (B, 2) int array-like of (h, w). Returns (geom (B, 4) int32
    [nh, nw, top, left], scale (B,) f32)."""
    import numpy as np
    hw = np.asarray(hw)
    h = hw[:, 0].astype(np.float64)
    w = hw[:, 1].astype(np.float64)
    S = float(out_size)
    scale = np.minimum(S / h, S / w)
    nh = (h * scale).astype(np.int64)          # int() truncation, ref :57
    nw = (w * scale).astype(np.int64)
    top = (out_size - nh) // 2
    left = (out_size - nw) // 2
    geom = np.stack([nh, nw, top, left], axis=1).astype(np.int32)
    return geom, scale.astype(np.float32)


def letterbox_images(
    canvases_u8: jax.Array,     # (B, Hc, Wc, 3) uint8, image at top-left
    hw: jax.Array,              # (B, 2) int32 actual (h, w) per image
    out_size: int,
    fill: int = 128,
    method: str = "nearest",
    geom: jax.Array | None = None,   # (B, 4) int32 from host_letterbox_geom
    scale: jax.Array | None = None,  # (B,) f32 from host_letterbox_geom
):
    """On-device batched letterbox: aspect-preserving resize of each valid
    (h, w) region onto a (out_size, out_size) canvas, centred, padded with
    ``fill`` — the device-side replacement for the reference's per-image
    host cv2 ``letter_box`` (core/utils/image_process.py:48-66; it uses
    INTER_NEAREST, which ``method="nearest"`` matches).

    Pass ``geom``/``scale`` from :func:`host_letterbox_geom` whenever hw is
    known on host (the eval harnesses do): the resized dims then equal the
    reference's float64 host arithmetic exactly. Without them, geometry is
    computed in-graph in f32, which differs by 1 px on ~6% of (h, w) pairs.
    Nearest source indices use exact int32 rational floor — identical to
    cv2's double formula except at exactly-divisible boundary points where
    cv2's own output is rounding-noise.

    Returns (canvas uint8 (B, S, S, 3), scale (B,) f32, pad_xy (B, 2) f32)
    — same contract as the host ``tpucv.utils.image_process.letter_box``.

    "nearest" is a pure uint8 gather (bandwidth-trivial); "linear" goes
    through jax.image.scale_and_translate (MXU einsums, ~GFLOPs/img).
    """
    S = out_size

    def one(img, hw1, geom1, scale1):
        h = hw1[0].astype(jnp.int32)
        w = hw1[1].astype(jnp.int32)
        nh, nw = geom1[0], geom1[1]
        top, left = geom1[2], geom1[3]
        yy = jnp.arange(S, dtype=jnp.int32)
        xx = jnp.arange(S, dtype=jnp.int32)
        in_y = (yy >= top) & (yy < top + nh)
        in_x = (xx >= left) & (xx < left + nw)
        if method == "nearest":
            # cv2 INTER_NEAREST: src = floor(dst * src_len / dst_len) —
            # exact rational floor in int32 ((S*max_dim)^... products
            # bounded by S*h < 2^31)
            sy = jnp.clip((yy - top) * h // jnp.maximum(nh, 1), 0, h - 1)
            sx = jnp.clip((xx - left) * w // jnp.maximum(nw, 1), 0, w - 1)
            out = jnp.take(jnp.take(img, sy, axis=0), sx, axis=1)
        else:
            out = jax.image.scale_and_translate(
                img.astype(jnp.float32), (S, S, 3), (0, 1),
                jnp.stack([scale1, scale1]),
                jnp.stack([top, left]).astype(jnp.float32),
                method="linear", antialias=False)
            out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
        inside = (in_y[:, None] & in_x[None, :])[..., None]
        out = jnp.where(inside, out, jnp.uint8(fill))
        return out, scale1, jnp.stack([left, top]).astype(jnp.float32)

    if geom is None or scale is None:
        # in-graph f32 fallback (legacy callers without host-side hw)
        hf = hw[:, 0].astype(jnp.float32)
        wf = hw[:, 1].astype(jnp.float32)
        sc = jnp.minimum(S / hf, S / wf)
        nh = jnp.floor(hf * sc).astype(jnp.int32)
        nw = jnp.floor(wf * sc).astype(jnp.int32)
        geom = jnp.stack([nh, nw, (S - nh) // 2, (S - nw) // 2], axis=1)
        scale = sc
    outs, scales, pads = jax.vmap(one)(canvases_u8, hw, geom, scale)
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
