"""Host input-pipeline throughput: mosaic+jitter+HSV batches at 640^2.

Measures loader-only img/s for num_workers in {0, 2, 4} on synthetic
indices (no disk IO — isolates the augmentation CPU cost). Compare against
device demand (bench.py train_img_per_sec) to size workers: you need
loader img/s > train img/s. NOTE: this box has 1 core, so multi-worker
numbers here show correctness + overhead only; scaling needs real cores.

Usage: python scripts/bench_loader.py [--batch 16] [--n 8]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

from tpucv.data.detection_dataset import (DetectionDataset,
                                          SyntheticDetectionIndex)
from tpucv.data.loader import Loader


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n", type=int, default=8, help="batches to time")
    ap.add_argument("--size", type=int, default=640)
    args = ap.parse_args()

    ds = DetectionDataset(
        SyntheticDetectionIndex(args.batch * (args.n + 2), args.size, 80),
        input_size=args.size, max_boxes=100, train=True)

    for nw in (0, 2, 4):
        ld = Loader(ds, args.batch, shuffle=True, num_workers=nw)
        it = iter(ld)
        next(it)                                  # warm up (worker spawn)
        t0 = time.perf_counter()
        got = 0
        for _ in range(args.n):
            next(it)
            got += args.batch
        dt = time.perf_counter() - t0
        it.close()
        print(f"num_workers={nw}: {got / dt:8.1f} img/s "
              f"({dt / args.n * 1e3:.1f} ms/batch)")


if __name__ == "__main__":
    main()
