"""End-to-end learning smoke: train YOLOv8n on the synthetic rectangle
dataset and verify mAP rises well above zero — exercises train step, data
path, decode, NMS and the VOC mAP engine as one system.

Usage: python scripts/smoke_learn.py [--steps 300] [--size 320]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--classes", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from tpucv.algorithms.base import init_on_cpu
    from tpucv.data.detection_dataset import (
        DetectionDataset, SyntheticDetectionIndex)
    from tpucv.data.loader import Loader
    from tpucv.losses.yolov8 import yolov8_loss
    from tpucv.models.yolov8 import Yolo8
    from tpucv.ops.preprocess import normalize_images
    from tpucv.train.schedules import warmup_multistep
    from tpucv.train.state import TrainState, make_train_step

    nc, S, B = args.classes, args.size, args.batch
    model = Yolo8(scale="n", nc=nc, dtype=jnp.bfloat16)
    variables = init_on_cpu(model, (1, S, S, 3), jnp.bfloat16)

    train_idx = SyntheticDetectionIndex(64, S, nc, max_objects=3, seed=0)
    val_idx = SyntheticDetectionIndex(16, S, nc, max_objects=3, seed=1)
    ds = DetectionDataset(train_idx, S, max_boxes=8, train=True,
                          mosaic_prob=0.0)
    loader = Loader(ds, B, shuffle=True)

    tx = optax.adam(warmup_multistep(2e-3, 50, [10**9]))

    def loss_fn(raw, batch):
        return yolov8_loss(raw, batch["gt_labels"], batch["gt_bboxes"],
                           batch["gt_mask"], nc=nc)

    step = make_train_step(model.apply, loss_fn, tx, donate=False)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)

    t0 = time.time()
    n = 0
    first = last = None
    while n < args.steps:
        loader.set_epoch(n // max(len(loader), 1))
        for batch in loader:
            db = {
                "images": normalize_images(
                    jnp.asarray(batch["images"]), jnp.bfloat16),
                "gt_labels": jnp.asarray(batch["gt_labels"]),
                "gt_bboxes": jnp.asarray(batch["gt_bboxes"]),
                "gt_mask": jnp.asarray(batch["gt_mask"]),
            }
            state, metrics = step(state, db)
            n += 1
            if n % 50 == 0 or n == 1:
                loss = float(metrics["loss"])
                if first is None:
                    first = loss
                last = loss
                print(f"step {n}: loss={loss:.3f} "
                      f"({(time.time() - t0):.0f}s)", flush=True)
            if n >= args.steps:
                break

    # evaluate on the val synthetic set
    from tpucv.configs.model_cfgs import Yolo8DetConfig
    from tpucv.algorithms.yolov8 import YOLOv8
    cfg = Yolo8DetConfig()
    cfg.dataset.input_size = S
    cfg.dataset.name = "voc"  # class-name list length >= nc
    cfg.train.mixed_precision = True
    cfg.decode.pre_nms_topk = 512
    algo = YOLOv8(cfg)
    algo.nc = nc
    algo.class_names = [f"c{i}" for i in range(nc)]
    infer_vars = {"params": state.params, "batch_stats": state.batch_stats}
    res = algo.evaluate_on_voc(infer_vars, val_idx, batch_size=8,
                               conf_threshold=0.05)
    print(f"RESULT first_loss={first:.2f} last_loss={last:.2f} "
          f"mAP50={res['mAP']:.3f}")
    return res["mAP"]


if __name__ == "__main__":
    main()
    os._exit(0)
