"""IoU-metric k-means anchor fitting (reference ``scripts/kmeans.py``:
KMeans :42, k=9 over VOC box w/h). Vectorised numpy; reads VOC xml or
synthesises boxes when the dataset is absent."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def iou_wh(boxes: np.ndarray, centers: np.ndarray) -> np.ndarray:
    """(N,2) x (K,2) IoU for centred boxes."""
    inter = (np.minimum(boxes[:, None, 0], centers[None, :, 0])
             * np.minimum(boxes[:, None, 1], centers[None, :, 1]))
    union = (boxes[:, 0] * boxes[:, 1])[:, None] \
        + (centers[:, 0] * centers[:, 1])[None] - inter
    return inter / np.maximum(union, 1e-9)


def kmeans_anchors(wh: np.ndarray, k: int = 9, iters: int = 300,
                   seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    centers = wh[rng.choice(len(wh), k, replace=False)]
    assign = None
    for _ in range(iters):
        d = 1.0 - iou_wh(wh, centers)
        new_assign = d.argmin(axis=1)
        if assign is not None and (new_assign == assign).all():
            break
        assign = new_assign
        for j in range(k):
            sel = wh[assign == j]
            if len(sel):
                centers[j] = np.median(sel, axis=0)
    order = np.argsort(centers[:, 0] * centers[:, 1])
    return centers[order]


def load_voc_wh(root: str, split: str = "train") -> np.ndarray:
    from tpucv.data.voc import VOCDetectionIndex
    idx = VOCDetectionIndex(root, split)
    whs = []
    for _, boxes, _ in idx.samples:
        if len(boxes):
            whs.append(boxes[:, 2:] - boxes[:, :2])
    return np.concatenate(whs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/root/data/VOCdevkit/VOC2012")
    ap.add_argument("--k", type=int, default=9)
    args = ap.parse_args()
    if os.path.isdir(os.path.join(args.root, "Annotations")):
        wh = load_voc_wh(args.root)
    else:
        print(f"no VOC at {args.root}; fitting on synthetic boxes")
        rng = np.random.default_rng(0)
        wh = np.exp(rng.normal(4.0, 0.8, (5000, 2))).clip(4, 600)
    anchors = kmeans_anchors(wh, args.k)
    mean_iou = iou_wh(wh, anchors).max(axis=1).mean()
    print("anchors (w, h):")
    for w, h in anchors:
        print(f"  ({w:.0f}, {h:.0f})")
    print(f"mean best IoU: {mean_iou:.3f}")


if __name__ == "__main__":
    main()
