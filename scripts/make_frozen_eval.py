"""Frozen synthetic-eval regression anchor (VERDICT r3 missing #4).

The reference ships frozen evaluation outputs under ``performance/``
(``performance/yolov7_coco_val2017.txt:1``, ``centernet_voc_val.txt``) as
its quality baseline. This environment has no real datasets, so the tpucv
analogue freezes a fully deterministic synthetic procedure instead:

  1. generate the 12-image synthetic COCO val split (seeded),
  2. train YOLOv8n(nc=80) on those same images for a fixed number of
     seeded, augmentation-free steps at 192² (overfitting is the point —
     the anchor needs stable nonzero detections, not generalisation),
  3. run the full evaluate_on_coco harness at the same matched scale and
     freeze the 12-metric COCO summary to
     ``performance/yolo8n_syncoco_val.txt``.

tests/test_frozen_eval.py re-runs the procedure and compares against the
committed file, so any change to the training step, decode, NMS, letterbox
geometry, or COCOeval protocol moves a committed number and is visible in
review — the same role the reference's performance/ files play.

Usage:  JAX_PLATFORMS=cpu python scripts/make_frozen_eval.py
"""

import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 300
TRAIN_S = 192
EVAL_S = 192
N_IMAGES = 12
METRIC_ORDER = [
    "AP", "AP50", "AP75", "APs", "APm", "APl",
    "AR1", "AR10", "AR100", "ARs", "ARm", "ARl",
]


def run(root: str, verbose: bool = False):
    """Returns the 12-metric stats dict of the frozen procedure."""
    import jax
    # The anchor is defined on the test suite's EXACT backend config: CPU
    # platform with 8 virtual host devices (tests/conftest.py). The device
    # count changes XLA:CPU's thread partitioning and therefore float
    # reduction order — the same procedure under 1 vs 8 virtual devices
    # measured AP 0.9167 vs 0.9652 — so the artifact and the test must pin
    # the same config. (config.update, not just the env var: sitecustomize
    # preloads jax with the remote-TPU platform selected.)
    flag = "--xla_force_host_platform_device_count=8"
    if flag not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " " + flag).strip()
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from tpucv.algorithms.base import init_on_cpu
    from tpucv.algorithms.yolov8 import YOLOv8
    from tpucv.configs.model_cfgs import Yolo8DetConfig
    from tpucv.data.coco import COCOIndex
    from tpucv.losses.yolov8 import yolov8_loss
    from tpucv.models.yolov8 import Yolo8
    from tpucv.train.state import TrainState, make_train_step
    from tpucv.utils.image_process import letter_box, read_image

    subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "make_synthetic_coco.py"),
         "--root", root, "--n", str(N_IMAGES)],
        check=True)
    index = COCOIndex(
        os.path.join(root, "annotations/instances_val2017.json"),
        os.path.join(root, "val2017"))
    assert len(index) == N_IMAGES

    # fixed training tensors: every val image letterboxed to TRAIN_S once,
    # no augmentation, no loader — bit-stable across runs
    nc, M = 80, 8
    imgs = np.zeros((N_IMAGES, TRAIN_S, TRAIN_S, 3), np.float32)
    gt_boxes = np.zeros((N_IMAGES, M, 4), np.float32)
    gt_labels = np.zeros((N_IMAGES, M), np.int32)
    gt_mask = np.zeros((N_IMAGES, M), bool)
    for i in range(N_IMAGES):
        path, boxes, labels = index[i]
        img = read_image(path)
        canvas, scale, pad = letter_box(img, (TRAIN_S, TRAIN_S))
        imgs[i] = canvas.astype(np.float32) / 255.0
        n = min(len(boxes), M)
        b = np.asarray(boxes[:n], np.float32)
        if n:
            gt_boxes[i, :n, 0::2] = b[:, 0::2] * scale + pad[0]
            gt_boxes[i, :n, 1::2] = b[:, 1::2] * scale + pad[1]
            gt_labels[i, :n] = labels[:n]
            gt_mask[i, :n] = True

    model = Yolo8(scale="n", nc=nc, dtype=jnp.float32)
    variables = init_on_cpu(model, (1, TRAIN_S, TRAIN_S, 3), jnp.float32)

    def loss_fn(raw, batch):
        return yolov8_loss(raw, batch["gt_labels"], batch["gt_bboxes"],
                           batch["gt_mask"], nc=nc)

    tx = optax.adam(3e-3)
    step = make_train_step(model.apply, loss_fn, tx, donate=False)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    B = 4
    for n in range(STEPS):
        sel = [(n * B + j) % N_IMAGES for j in range(B)]
        batch = {"images": jnp.asarray(imgs[sel]),
                 "gt_bboxes": jnp.asarray(gt_boxes[sel]),
                 "gt_labels": jnp.asarray(gt_labels[sel]),
                 "gt_mask": jnp.asarray(gt_mask[sel])}
        state, m = step(state, batch)
        if verbose and n % 25 == 0:
            print(f"step {n}: loss {float(m['loss']):.3f}", flush=True)

    cfg = Yolo8DetConfig()
    cfg.dataset.input_size = EVAL_S
    cfg.train.mixed_precision = False
    cfg.decode.pre_nms_topk = 512
    algo = YOLOv8(cfg)
    fv = {"params": state.params, "batch_stats": state.batch_stats}
    stats = algo.evaluate_on_coco(fv, index, batch_size=4,
                                  result_dir=os.path.join(root, "result"),
                                  verbose=verbose)
    return stats


def format_artifact(stats) -> str:
    lines = [
        "# Frozen synthetic-COCO eval anchor — scripts/make_frozen_eval.py",
        f"# YOLOv8n nc=80, {STEPS} seeded steps @{TRAIN_S}^2 on the "
        f"{N_IMAGES}-image synthetic val split, eval @{EVAL_S}^2",
    ]
    lines += [f"{k} = {stats[k]:.4f}" for k in METRIC_ORDER]
    return "\n".join(lines) + "\n"


def main():
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "performance", "yolo8n_syncoco_val.txt")
    stats = run("/tmp/frozen_syncoco", verbose=True)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write(format_artifact(stats))
    print(f"wrote {out}")
    print(format_artifact(stats))


if __name__ == "__main__":
    main()
