"""Coordinate-format conversions + letterbox box/keypoint rescaling —
the remaining tail of the reference's ``core/utils/ultralytics_ops.py``
(:66-113 segment2box/scale_boxes, :267-341 clip/scale_image, :343-537
xy*/ltwh* family, segments2boxes, resample_segments, :637-667
scale_coords). Pure jnp/numpy math: works on device arrays inside jit and
on host numpy alike (everything is elementwise, static-shape).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


# ------------------------------------------------------------ clip / scale
def clip_boxes(boxes, shape):
    """Clip xyxy boxes to image bounds (h, w) (ultralytics_ops.py:267-284)."""
    h, w = shape[:2]
    return jnp.stack([
        jnp.clip(boxes[..., 0], 0, w), jnp.clip(boxes[..., 1], 0, h),
        jnp.clip(boxes[..., 2], 0, w), jnp.clip(boxes[..., 3], 0, h),
    ], axis=-1)


def clip_coords(coords, shape):
    """Clip (..., 2) xy points to image bounds (ultralytics_ops.py:286-303)."""
    h, w = shape[:2]
    return jnp.stack([
        jnp.clip(coords[..., 0], 0, w), jnp.clip(coords[..., 1], 0, h),
    ], axis=-1)


def _letterbox_gain_pad(img1_shape, img0_shape, ratio_pad=None):
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = ((img1_shape[1] - img0_shape[1] * gain) / 2,
               (img1_shape[0] - img0_shape[0] * gain) / 2)
    else:
        gain, pad = ratio_pad[0][0], ratio_pad[1]
    return gain, pad


def scale_boxes(img1_shape, boxes, img0_shape, ratio_pad=None):
    """Map xyxy boxes from the letterboxed canvas ``img1_shape`` back to the
    original image ``img0_shape`` (ultralytics_ops.py:86-113)."""
    gain, pad = _letterbox_gain_pad(img1_shape, img0_shape, ratio_pad)
    boxes = (boxes - jnp.asarray([pad[0], pad[1], pad[0], pad[1]],
                                 dtype=jnp.asarray(boxes).dtype)) / gain
    return clip_boxes(boxes, img0_shape)


def scale_coords(img1_shape, coords, img0_shape, ratio_pad=None,
                 normalize: bool = False):
    """Same for (..., 2+) keypoint coords; extra trailing channels
    (visibility) pass through (ultralytics_ops.py:637-667)."""
    gain, pad = _letterbox_gain_pad(img1_shape, img0_shape, ratio_pad)
    coords = jnp.asarray(coords)
    xy = (coords[..., :2] - jnp.asarray(pad, coords.dtype)) / gain
    xy = clip_coords(xy, img0_shape)
    if normalize:
        xy = xy / jnp.asarray([img0_shape[1], img0_shape[0]], coords.dtype)
    return jnp.concatenate([xy, coords[..., 2:]], axis=-1) \
        if coords.shape[-1] > 2 else xy


# ------------------------------------------------------------- xy families
def xywhn2xyxy(x, w=640, h=640, padw=0, padh=0):
    """Normalized cx,cy,w,h -> pixel xyxy (ultralytics_ops.py:378-398)."""
    x = jnp.asarray(x)
    cx, cy, bw, bh = (x[..., i] for i in range(4))
    return jnp.stack([w * (cx - bw / 2) + padw, h * (cy - bh / 2) + padh,
                      w * (cx + bw / 2) + padw, h * (cy + bh / 2) + padh],
                     axis=-1)


def xyxy2xywhn(x, w=640, h=640, clip=False, eps=0.0):
    """Pixel xyxy -> normalized cx,cy,w,h (ultralytics_ops.py:400-422)."""
    x = jnp.asarray(x)
    if clip:
        x = clip_boxes(x, (h - eps, w - eps))
    x1, y1, x2, y2 = (x[..., i] for i in range(4))
    return jnp.stack([(x1 + x2) / 2 / w, (y1 + y2) / 2 / h,
                      (x2 - x1) / w, (y2 - y1) / h], axis=-1)


def xyn2xy(x, w=640, h=640, padw=0, padh=0):
    """Normalized xy segment points -> pixels (ultralytics_ops.py:424-441)."""
    x = jnp.asarray(x)
    return jnp.stack([w * x[..., 0] + padw, h * x[..., 1] + padh], axis=-1)


def xywh2ltwh(x):
    x = jnp.asarray(x)
    return jnp.stack([x[..., 0] - x[..., 2] / 2, x[..., 1] - x[..., 3] / 2,
                      x[..., 2], x[..., 3]], axis=-1)


def xyxy2ltwh(x):
    x = jnp.asarray(x)
    return jnp.stack([x[..., 0], x[..., 1],
                      x[..., 2] - x[..., 0], x[..., 3] - x[..., 1]], axis=-1)


def ltwh2xywh(x):
    x = jnp.asarray(x)
    return jnp.stack([x[..., 0] + x[..., 2] / 2, x[..., 1] + x[..., 3] / 2,
                      x[..., 2], x[..., 3]], axis=-1)


def ltwh2xyxy(x):
    x = jnp.asarray(x)
    return jnp.stack([x[..., 0], x[..., 1],
                      x[..., 0] + x[..., 2], x[..., 1] + x[..., 3]], axis=-1)


# -------------------------------------------------------------- segments
def segment2box(segment, width=640, height=640):
    """Polygon (N, 2) -> clipped xyxy box of its in-bounds points
    (ultralytics_ops.py:66-84). Host-side numpy (ragged polygons)."""
    seg = np.asarray(segment, np.float32)
    x, y = seg[:, 0], seg[:, 1]
    inside = (x >= 0) & (y >= 0) & (x <= width) & (y <= height)
    x, y = x[inside], y[inside]
    if not len(x):
        return np.zeros(4, np.float32)
    return np.array([x.min(), y.min(), x.max(), y.max()], np.float32)


def segments2boxes(segments):
    """List of polygons -> (N, 4) cxcywh boxes (ultralytics_ops.py:502-517)."""
    from tpucv.ops.boxes import xyxy2xywh

    boxes = []
    for s in segments:
        s = np.asarray(s, np.float32)
        if len(s):
            boxes.append([s[:, 0].min(), s[:, 1].min(),
                          s[:, 0].max(), s[:, 1].max()])
        else:
            boxes.append([0.0, 0.0, 0.0, 0.0])
    return np.asarray(xyxy2xywh(np.asarray(boxes, np.float32)))


def resample_segments(segments, n=1000):
    """Up-sample each polygon to n points by linear interpolation along the
    closed contour (ultralytics_ops.py:519-537)."""
    out = []
    for s in segments:
        s = np.asarray(s, np.float32)
        s = np.concatenate([s, s[0:1]], axis=0)     # close the loop
        x = np.linspace(0, len(s) - 1, n)
        xp = np.arange(len(s))
        out.append(np.stack([np.interp(x, xp, s[:, 0]),
                             np.interp(x, xp, s[:, 1])], axis=-1))
    return out


def make_divisible(x, divisor):
    """Round x up to the nearest multiple (ultralytics_ops.py:115-129)."""
    import math
    return math.ceil(x / divisor) * divisor
