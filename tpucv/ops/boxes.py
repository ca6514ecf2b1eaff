"""Box geometry ops — pure jnp, fully vectorised, static shapes.

Capability parity with the reference's three IoU modules
(``core/utils/bboxes.py:96-136``, ``core/utils/ultralytics_iou.py:64-117``,
``core/utils/iou.py``) collapsed into one implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def xywh2xyxy(b: jax.Array) -> jax.Array:
    """(cx, cy, w, h) -> (x1, y1, x2, y2)."""
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy2xywh(b: jax.Array) -> jax.Array:
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def box_area(b: jax.Array) -> jax.Array:
    return jnp.clip(b[..., 2] - b[..., 0], 0) * jnp.clip(b[..., 3] - b[..., 1], 0)


def pairwise_iou(a: jax.Array, b: jax.Array, eps: float = 1e-7) -> jax.Array:
    """IoU matrix between (..., M, 4) and (..., N, 4) xyxy boxes -> (..., M, N).

    Replaces ``jaccard`` (reference bboxes.py:118-136) / ``box_iou``
    (ultralytics_iou.py:83-102).
    """
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[..., :, None] + box_area(b)[..., None, :] - inter
    return inter / (union + eps)


def bbox_iou(
    box1: jax.Array,
    box2: jax.Array,
    xywh: bool = True,
    giou: bool = False,
    diou: bool = False,
    ciou: bool = False,
    eps: float = 1e-7,
) -> jax.Array:
    """Elementwise IoU with GIoU/DIoU/CIoU variants
    (reference ``ultralytics_iou.py:64-117``). Shapes broadcast; returns (...)."""
    if xywh:
        box1, box2 = xywh2xyxy(box1), xywh2xyxy(box2)
    b1x1, b1y1, b1x2, b1y2 = (box1[..., i] for i in range(4))
    b2x1, b2y1, b2x2, b2y2 = (box2[..., i] for i in range(4))
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1

    inter = (jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0)
             * jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0))
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if not (giou or diou or ciou):
        return iou

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    if giou:
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area

    c2 = cw**2 + ch**2 + eps
    rho2 = (((b2x1 + b2x2) - (b1x1 + b1x2)) ** 2
            + ((b2y1 + b2y2) - (b1y1 + b1y2)) ** 2) / 4
    if diou:
        return iou - rho2 / c2
    # CIoU
    v = (4 / jnp.pi**2) * (jnp.arctan(w2 / (h2 + eps))
                           - jnp.arctan(w1 / (h1 + eps))) ** 2
    alpha = v / (v - iou + (1 + eps))
    alpha = jax.lax.stop_gradient(alpha)
    return iou - (rho2 / c2 + v * alpha)


def pairwise_ciou(gt: jax.Array, pd: jax.Array, eps: float = 1e-7) -> jax.Array:
    """CIoU matrix between (B, M, 4) GTs and (B, A, 4) preds -> (B, M, A).

    Same expression tree as ``bbox_iou(gt[:,:,None], pd[:,None], ciou=True)``
    (identical numerics), but every per-box quantity — areas, the two arctan
    aspect terms, the centre sums — is computed at its natural (B, M) /
    (B, A) shape behind an optimization barrier. Without the barrier XLA
    fuses the producers into the (B, M, A) consumer loop and evaluates the
    arctans 2*M*A times per image instead of M+A (measured ~4 ms of a 13 ms
    TAL forward at B=128, M=32, A=8400 on v5e).
    """
    gx1, gy1, gx2, gy2 = (gt[..., i] for i in range(4))    # (B, M)
    px1, py1, px2, py2 = (pd[..., i] for i in range(4))    # (B, A)
    gw, gh = gx2 - gx1, gy2 - gy1
    pw, ph = px2 - px1, py2 - py1
    (g_area, p_area, g_atan, p_atan, gcx, pcx, gcy, pcy) = \
        jax.lax.optimization_barrier((
            gw * gh, pw * ph,
            jnp.arctan(gw / (gh + eps)), jnp.arctan(pw / (ph + eps)),
            gx1 + gx2, px1 + px2, gy1 + gy2, py1 + py2))

    gx1, gy1, gx2, gy2 = (v[:, :, None] for v in (gx1, gy1, gx2, gy2))
    inter = (jnp.clip(jnp.minimum(gx2, px2[:, None]) -
                      jnp.maximum(gx1, px1[:, None]), 0)
             * jnp.clip(jnp.minimum(gy2, py2[:, None]) -
                        jnp.maximum(gy1, py1[:, None]), 0))
    union = g_area[:, :, None] + p_area[:, None] - inter + eps
    iou = inter / union
    cw = jnp.maximum(gx2, px2[:, None]) - jnp.minimum(gx1, px1[:, None])
    ch = jnp.maximum(gy2, py2[:, None]) - jnp.minimum(gy1, py1[:, None])
    c2 = cw**2 + ch**2 + eps
    rho2 = ((pcx[:, None] - gcx[:, :, None]) ** 2
            + (pcy[:, None] - gcy[:, :, None]) ** 2) / 4
    v = (4 / jnp.pi**2) * (p_atan[:, None] - g_atan[:, :, None]) ** 2
    alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
    return iou - (rho2 / c2 + v * alpha)


def dist2bbox(distance: jax.Array, anchor_points: jax.Array,
              xywh: bool = False) -> jax.Array:
    """(l, t, r, b) distances + anchor centres -> boxes
    (reference bboxes.py:213-221)."""
    lt, rb = jnp.split(distance, 2, axis=-1)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        return jnp.concatenate([(x1y1 + x2y2) / 2, x2y2 - x1y1], axis=-1)
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def bbox2dist(bbox: jax.Array, anchor_points: jax.Array,
              reg_max: float) -> jax.Array:
    """Inverse of dist2bbox, clamped to reg_max-0.01
    (reference bboxes.py:224-228)."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    d = jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1)
    return jnp.clip(d, 0, reg_max - 0.01)
