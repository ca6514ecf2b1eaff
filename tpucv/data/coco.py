"""COCO detection annotations — pure-json index.

The reference depends on pycocotools' C extension for both dataset loading
(``core/data/detection_dataset.py``) and evaluation (``core/metrics/mAP.py``).
pycocotools is not available here; this index parses instances_*.json with the
stdlib and exposes the same facts (images, per-image anns, category mapping).
The evaluation side lives in ``tpucv.metrics.coco_map``.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import numpy as np


class COCOIndex:
    def __init__(self, annotation_file: str, image_root: str,
                 min_box: float = 1e-3):
        with open(annotation_file) as f:
            data = json.load(f)
        self.image_root = image_root
        self.images = {im["id"]: im for im in data["images"]}
        cats = sorted(data["categories"], key=lambda c: c["id"])
        self.cat_ids = [c["id"] for c in cats]          # 80 official ids
        self.cat_to_contig = {cid: i for i, cid in enumerate(self.cat_ids)}
        self.contig_to_cat = {i: cid for i, cid in enumerate(self.cat_ids)}
        self.cat_names = [c["name"] for c in cats]

        anns_by_img = defaultdict(list)
        for a in data.get("annotations", []):
            if a.get("iscrowd", 0):
                continue
            x, y, w, h = a["bbox"]
            if w < min_box or h < min_box:
                continue
            anns_by_img[a["image_id"]].append(a)

        self.samples: List[Tuple[str, np.ndarray, np.ndarray, int]] = []
        for img_id, im in self.images.items():
            anns = anns_by_img.get(img_id, [])
            if anns:
                boxes = np.asarray(
                    [[a["bbox"][0], a["bbox"][1],
                      a["bbox"][0] + a["bbox"][2], a["bbox"][1] + a["bbox"][3]]
                     for a in anns], np.float32)
                labels = np.asarray(
                    [self.cat_to_contig[a["category_id"]] for a in anns],
                    np.int32)
            else:
                boxes = np.zeros((0, 4), np.float32)
                labels = np.zeros((0,), np.int32)
            path = os.path.join(image_root, im["file_name"])
            self.samples.append((path, boxes, labels, img_id))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i][:3]

    def image_id(self, i) -> int:
        return self.samples[i][3]
