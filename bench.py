"""Headline benchmark: YOLOv8n end-to-end images/sec/chip (decode+NMS on-chip).

Measures the jitted inference path — forward (bf16) + DFL decode + class-aware
fixed-shape NMS — on one chip, matching the north-star metric in BASELINE.json
(>=5000 img/s/chip on v5e). Prints exactly one JSON line.

Timing methodology: distinct input buffers per call, pipelined dispatch, and a
host fetch of the last output to fence the device stream (a bare
``block_until_ready`` is not a reliable fence through the axon relay).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpucv.models import get_yolo8_n
    from tpucv.decode.yolov8 import decode_boxes

    from tpucv.algorithms.base import init_on_cpu

    batch = 128
    model = get_yolo8_n(dtype=jnp.bfloat16)
    variables = init_on_cpu(model, (1, 640, 640, 3), jnp.bfloat16)

    @jax.jit
    def infer(v, x):
        raw = model.apply(v, x)
        boxes, scores, classes, valid = decode_boxes(
            raw, conf_threshold=0.25, iou_threshold=0.7, max_det=300,
            pre_nms_topk=512)
        # reduce to a tiny fetchable fence value that depends on everything
        return boxes.sum() + scores.sum() + valid.sum()

    rngs = np.random.default_rng(0)
    imgs = [
        jax.device_put(
            rngs.random((batch, 640, 640, 3), dtype=np.float32)
        ).astype(jnp.bfloat16)
        for _ in range(4)
    ]

    float(infer(variables, imgs[0]))  # compile + first exec

    n_iters = 40
    t0 = time.perf_counter()
    outs = [infer(variables, imgs[i % 4]) for i in range(n_iters)]
    float(outs[-1])  # host fetch fences the in-order device stream
    dt = time.perf_counter() - t0

    ips = batch * n_iters / dt
    print(json.dumps({
        "metric": "yolov8n_640_e2e_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(ips / 5000.0, 4),
    }))


if __name__ == "__main__":
    main()
