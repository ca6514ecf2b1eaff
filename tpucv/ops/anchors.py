"""Anchor / grid generation — static, computed once per (shape, stride) set.

Replaces the reference's ``make_anchors`` (core/utils/anchor.py:126-145) and
SSD anchor generators (core/utils/anchor.py:8-99, core/algorithms/ssd.py:482-541).
All outputs are plain device arrays created at trace time (constants under jit).
"""

from __future__ import annotations

import itertools
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_anchors(
    feat_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    grid_cell_offset: float = 0.5,
) -> Tuple[jax.Array, jax.Array]:
    """Anchor centre points + per-anchor stride for anchor-free heads.

    Returns (anchor_points (A,2) in feature units, strides (A,1)); A = sum HW.
    Matches reference ``core/utils/anchor.py:126-145`` ordering (x fastest).
    """
    points, strs = [], []
    for (h, w), s in zip(feat_shapes, strides):
        sx = np.arange(w, dtype=np.float32) + grid_cell_offset
        sy = np.arange(h, dtype=np.float32) + grid_cell_offset
        gy, gx = np.meshgrid(sy, sx, indexing="ij")
        points.append(np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
        strs.append(np.full((h * w, 1), s, dtype=np.float32))
    return jnp.asarray(np.concatenate(points)), jnp.asarray(np.concatenate(strs))


def generate_ssd_anchors(
    input_size: int,
    feature_shapes: Sequence[int],
    anchor_sizes: Sequence[int],
    aspect_ratios: Sequence[Sequence[int]],
) -> jax.Array:
    """SSD prior boxes, normalised xyxy in [0,1], shape (num_priors, 4).

    Behavioural parity with the reference generator
    (``core/algorithms/ssd.py:482-541`` / ``core/utils/anchor.py:57-99``):
    per cell → [min, sqrt(min*max)] squares plus ar & 1/ar rectangles.
    SSD300 yields 8732 priors (ssd.py:540).
    """
    all_boxes: List[np.ndarray] = []
    for k, fs in enumerate(feature_shapes):
        min_size = anchor_sizes[k]
        max_size = anchor_sizes[k + 1]
        # box widths/heights for this level, in pixels
        box_wh = [(min_size, min_size),
                  (math.sqrt(min_size * max_size), math.sqrt(min_size * max_size))]
        for ar in aspect_ratios[k]:
            box_wh.append((min_size * math.sqrt(ar), min_size / math.sqrt(ar)))
            box_wh.append((min_size / math.sqrt(ar), min_size * math.sqrt(ar)))
        box_wh_arr = np.array(box_wh, dtype=np.float32)  # (P,2)

        step = input_size / fs
        centers = (np.arange(fs, dtype=np.float32) + 0.5) * step
        cy, cx = np.meshgrid(centers, centers, indexing="ij")
        cxy = np.stack([cx.reshape(-1), cy.reshape(-1)], axis=-1)  # (fs*fs, 2)

        # (fs*fs, P, 4) xyxy
        half = box_wh_arr / 2.0
        mins = cxy[:, None, :] - half[None, :, :]
        maxs = cxy[:, None, :] + half[None, :, :]
        boxes = np.concatenate([mins, maxs], axis=-1).reshape(-1, 4)
        all_boxes.append(boxes)
    out = np.concatenate(all_boxes, axis=0) / input_size
    return jnp.asarray(np.clip(out, 0.0, 1.0))


def yolo_anchor_grid(
    anchors: np.ndarray, feat_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
) -> List[Tuple[jax.Array, jax.Array]]:
    """Per-level (grid_xy (H,W,2), anchor_wh (na,2)) pairs for anchor-based
    YOLO heads (v3/v7). ``anchors`` is (nl, na, 2) in pixels."""
    out = []
    for l, ((h, w), s) in enumerate(zip(feat_shapes, strides)):
        gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                             np.arange(w, dtype=np.float32), indexing="ij")
        grid = np.stack([gx, gy], axis=-1)
        out.append((jnp.asarray(grid), jnp.asarray(anchors[l], dtype=np.float32)))
    return out
