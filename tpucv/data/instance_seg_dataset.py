"""Instance-segmentation data: images + boxes + per-instance masks at
prototype resolution, fixed shapes.

No counterpart exists in the reference (it has no instance-seg task).
COCO polygons rasterise via cv2.fillPoly (no pycocotools); indices without
polygons (synthetic rectangles, plain VOC) fall back to box-filled masks —
exactly right for the synthetic data, whose objects ARE rectangles.

The seg train path uses a PLAIN resize to the square input (no mosaic /
letterbox): masks must stay aligned with the image, and polygon coords
scale linearly under plain resize.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


class InstanceSegDataset:
    # train/eval items are identical (plain letterbox; augmentation would
    # have to transform the instance masks too — not implemented)
    def __init__(self, index, input_size: int, max_boxes: int,
                 mask_down: int = 4, train: bool = False):
        del train
        self.index = index
        self.size = input_size
        self.max_boxes = max_boxes
        self.mask_down = mask_down

    def __len__(self):
        return len(self.index)

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __getitem__(self, i):
        import cv2

        path, boxes, labels = self.index[i]
        if isinstance(path, str):
            from tpucv.utils.image_process import read_image
            img = read_image(path)
        else:
            img = path
        h, w = img.shape[:2]
        S = self.size
        Hm = S // self.mask_down
        sx, sy = S / w, S / h
        if (h, w) != (S, S):
            img = cv2.resize(img, (S, S), interpolation=cv2.INTER_LINEAR)
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4) * \
            np.asarray([sx, sy, sx, sy], np.float32)

        M = self.max_boxes
        n = min(len(boxes), M)
        out_boxes = np.zeros((M, 4), np.float32)
        out_labels = np.zeros((M,), np.int32)
        out_valid = np.zeros((M,), bool)
        masks = np.zeros((M, Hm, Hm), np.uint8)
        out_boxes[:n] = boxes[:n]
        out_labels[:n] = np.asarray(labels, np.int32)[:n]
        out_valid[:n] = True

        polys = getattr(self.index, "polygons", None)
        mscale = np.asarray([sx / self.mask_down, sy / self.mask_down],
                            np.float32)
        for j in range(n):
            poly_list = polys(i, j) if callable(polys) else None
            if poly_list:
                pts = [np.round(np.asarray(p, np.float32).reshape(-1, 2)
                                * mscale).astype(np.int32)
                       for p in poly_list if len(p) >= 6]
                if pts:
                    cv2.fillPoly(masks[j], pts, 1)
                    continue
            # box-filled fallback (exact for rectangle datasets)
            x1, y1, x2, y2 = boxes[j] / self.mask_down
            masks[j, int(y1):max(int(np.ceil(y2)), int(y1) + 1),
                  int(x1):max(int(np.ceil(x2)), int(x1) + 1)] = 1

        return {"images": img.astype(np.uint8), "gt_bboxes": out_boxes,
                "gt_labels": out_labels, "gt_mask": out_valid,
                "gt_inst_masks": masks}


def instance_seg_collate(items: Sequence[Dict]) -> Dict[str, np.ndarray]:
    return {k: np.stack([it[k] for it in items]) for k in items[0]}
