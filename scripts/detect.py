"""Video detection loop (reference ``scripts/detect.py:8-45``), without the
per-frame temp-jpg round trip the reference does — frames go straight through
the jitted infer fn."""

from __future__ import annotations

import os
import time

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

import jax
import jax.numpy as jnp

from tpucv.utils.image_process import letter_box, reverse_letter_box
from tpucv.utils.visualize import draw_detections


def detect_video(algo, variables, src: str, dst_dir: str = "detect_results"):
    cap = cv2.VideoCapture(src)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video {src}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 25
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    os.makedirs(dst_dir, exist_ok=True)
    out_path = os.path.join(dst_dir, "out_" + os.path.basename(src))
    writer = cv2.VideoWriter(
        out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))

    infer = algo.make_infer_fn()
    s = algo.input_size
    n, t0 = 0, time.time()
    while True:
        ok, frame_bgr = cap.read()
        if not ok:
            break
        frame = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB)
        canvas, scale, pad = letter_box(frame, (s, s))
        boxes, scores, classes, valid = jax.device_get(
            infer(variables, jnp.asarray(canvas[None])))
        v = np.asarray(valid[0])
        boxes = reverse_letter_box(
            np.asarray(boxes[0])[v], scale, pad, frame.shape[:2])
        drawn = draw_detections(
            frame, boxes, np.asarray(scores[0])[v], np.asarray(classes[0])[v],
            algo.class_names)
        n += 1
        cur_fps = n / (time.time() - t0)
        cv2.putText(drawn, f"fps: {cur_fps:.1f}", (10, 30),
                    cv2.FONT_HERSHEY_SIMPLEX, 1.0, (0, 255, 0), 2)
        writer.write(cv2.cvtColor(drawn, cv2.COLOR_RGB2BGR))
    writer.release()
    cap.release()
    print(f"wrote {out_path} ({n} frames, {n / (time.time() - t0):.1f} fps)")
    return out_path
