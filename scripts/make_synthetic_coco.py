"""Generate a tiny COCO-format dataset (instances_val2017.json + jpgs) so
the full ``evaluate.py`` CLI and COCO eval harness run end-to-end on any
machine (the reference assumes a real COCO checkout; tpucv's trainers have
a synthetic fallback but the evaluate CLI needs real files on disk).

Usage:
    python scripts/make_synthetic_coco.py --root /tmp/syncoco [--n 24]
    TPUCV_COCO_ROOT=/tmp/syncoco python evaluate.py --model yolo8_det --dataset coco
"""

import argparse
import json
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, ".")

# the official 80 category ids (with gaps), as in instances_val2017.json
COCO_CAT_IDS = [
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 20, 21,
    22, 23, 24, 25, 27, 28, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42,
    43, 44, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61,
    62, 63, 64, 65, 67, 70, 72, 73, 74, 75, 76, 77, 78, 79, 80, 81, 82, 84,
    85, 86, 87, 88, 89, 90,
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/syncoco")
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--subset", default="val")
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    args = ap.parse_args()

    img_dir = os.path.join(args.root, f"{args.subset}2017")
    ann_dir = os.path.join(args.root, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    H, W = args.hw
    rng = np.random.default_rng(0)
    images, annotations = [], []
    ann_id = 1
    for i in range(args.n):
        img_id = 1000 + i
        name = f"{img_id:012d}.jpg"
        img = rng.integers(0, 60, (H, W, 3), dtype=np.uint8)
        for _ in range(int(rng.integers(1, 7))):
            w = int(rng.integers(W // 10, W // 3))
            h = int(rng.integers(H // 10, H // 3))
            x = int(rng.integers(0, W - w))
            y = int(rng.integers(0, H - h))
            k = int(rng.integers(0, 80))
            color = (int(60 + 2 * k), int(rng.integers(90, 255)),
                     int(rng.integers(90, 255)))
            img[y:y + h, x:x + w] = color
            # ~10% crowd regions exercise the ignore-region eval protocol
            # end-to-end (drawn as a noisy cluster, like real crowds)
            iscrowd = int(rng.random() < 0.1)
            if iscrowd:
                img[y:y + h, x:x + w] = rng.integers(
                    60, 255, (h, w, 3), dtype=np.uint8)
            annotations.append({
                "id": ann_id, "image_id": img_id,
                "category_id": COCO_CAT_IDS[k],
                "bbox": [float(x), float(y), float(w), float(h)],
                "area": float(w * h), "iscrowd": iscrowd,
            })
            ann_id += 1
        cv2.imwrite(os.path.join(img_dir, name),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        images.append({"id": img_id, "file_name": name,
                       "height": H, "width": W})

    js = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": c, "name": f"cat{c}"} for c in COCO_CAT_IDS],
    }
    path = os.path.join(ann_dir, f"instances_{args.subset}2017.json")
    with open(path, "w") as f:
        json.dump(js, f)
    print(f"wrote {len(images)} images / {len(annotations)} anns under "
          f"{args.root}")


if __name__ == "__main__":
    main()
