"""Generate a tiny VOC-format dataset (JPEGImages + Annotations xml +
ImageSets/Main splits) so the VOC train/evaluate CLIs run end-to-end on
machines without VOC2012 — VOC counterpart of make_synthetic_coco.py.

Usage:
    python scripts/make_synthetic_voc.py --root /tmp/synvoc [--n 24]
    TPUCV_VOC_ROOT=/tmp/synvoc python evaluate.py --model yolo8_det --dataset voc
"""

import argparse
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, ".")

from tpucv.configs.dataset_cfg import VOC_CLASSES  # noqa: E402


def _xml(img_id, hw, objs):
    h, w = hw
    parts = [f"<annotation><filename>{img_id}.jpg</filename>",
             f"<size><width>{w}</width><height>{h}</height>"
             f"<depth>3</depth></size>"]
    for name, (x1, y1, x2, y2), difficult in objs:
        parts.append(
            f"<object><name>{name}</name><difficult>{difficult}</difficult>"
            f"<bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin>"
            f"<xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox></object>")
    parts.append("</annotation>")
    return "".join(parts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synvoc")
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--hw", type=int, nargs=2, default=(375, 500))
    args = ap.parse_args()

    for d in ("JPEGImages", "Annotations", "ImageSets/Main"):
        os.makedirs(os.path.join(args.root, d), exist_ok=True)

    H, W = args.hw
    rng = np.random.default_rng(0)
    ids = []
    for i in range(args.n):
        img_id = f"{2026000000 + i:012d}"
        ids.append(img_id)
        img = rng.integers(0, 60, (H, W, 3), dtype=np.uint8)
        objs = []
        for _ in range(int(rng.integers(1, 6))):
            w = int(rng.integers(W // 10, W // 3))
            h = int(rng.integers(H // 10, H // 3))
            x = int(rng.integers(0, W - w))
            y = int(rng.integers(0, H - h))
            k = int(rng.integers(0, len(VOC_CLASSES)))
            difficult = int(rng.random() < 0.1)   # exercise the flag
            color = (int(60 + 9 * k), int(rng.integers(90, 255)),
                     int(rng.integers(90, 255)))
            img[y:y + h, x:x + w] = color
            objs.append((VOC_CLASSES[k], (x + 1, y + 1, x + w, y + h),
                         difficult))
        cv2.imwrite(os.path.join(args.root, "JPEGImages", f"{img_id}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        with open(os.path.join(args.root, "Annotations",
                               f"{img_id}.xml"), "w") as f:
            f.write(_xml(img_id, (H, W), objs))

    k = max(args.n * 3 // 4, 1)
    for split, sl in (("train", ids[:k]), ("val", ids[k:]), ("trainval", ids)):
        with open(os.path.join(args.root, "ImageSets/Main",
                               f"{split}.txt"), "w") as f:
            f.write("\n".join(sl) + "\n")
    print(f"wrote {args.n} images under {args.root} "
          f"(train {k} / val {args.n - k})")


if __name__ == "__main__":
    main()
