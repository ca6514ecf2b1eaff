"""Serving performance capture: drive a running serve.py with concurrent
closed-loop clients and record latency percentiles vs offered load
(VERDICT r4 item 6 — verify the "serving ≡ bench" claim with data).

Starts the server in-process (no ckpt needed for throughput — weights
don't change the program), then for each concurrency level N runs N
closed-loop clients for --secs seconds and reports:

  throughput (img/s), latency p50/p95/p99 (ms), mean batch occupancy,
  error/rejection counts

The max-throughput point and the saturation behaviour of the
micro-batcher's max_wait_ms window are what the table is for.

Run (on the TPU host):
  python scripts/serve_loadtest.py [--model yolo8_det] [--batch 16]
      [--levels 1,2,4,8,16,32] [--secs 12]
"""

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_jpegs(n=8, hw=(480, 640)):
    import cv2

    rng = np.random.default_rng(0)
    out = []
    for i in range(n):
        img = rng.integers(0, 60, (64, 64, 3), np.uint8)
        img = np.tile(img, (hw[0] // 64 + 1, hw[1] // 64 + 1, 1))[
            :hw[0], :hw[1]]
        img[100:300, 200:400] = rng.integers(64, 255, 3)
        ok, buf = cv2.imencode(".jpg", img,
                               [int(cv2.IMWRITE_JPEG_QUALITY), 90])
        assert ok
        out.append(buf.tobytes())
    return out


def make_raws(n=8, hw=(480, 640)):
    """Raw uint8 RGB bodies + headers: isolates batcher+device serving
    overhead from host JPEG decode (the binding cost on few-core hosts)."""
    rng = np.random.default_rng(0)
    out = []
    for _ in range(n):
        img = rng.integers(0, 255, (*hw, 3), np.uint8)
        out.append(img.tobytes())
    headers = {"Content-Type": "application/x-raw-rgb",
               "X-Height": str(hw[0]), "X-Width": str(hw[1])}
    return out, headers


def run_level(url, bodies, n_clients, secs,
              headers={"Content-Type": "image/jpeg"}):
    lat, errors = [], [0]
    stop = time.perf_counter() + secs
    lock = threading.Lock()

    def client(k):
        i = k
        while time.perf_counter() < stop:
            body = bodies[i % len(bodies)]
            i += 1
            req = urllib.request.Request(url, data=body, headers=headers)
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=60) as r:
                    r.read()
                with lock:
                    lat.append(time.perf_counter() - t0)
            except Exception:                     # noqa: BLE001
                with lock:
                    errors[0] += 1

    threads = [threading.Thread(target=client, args=(k,))
               for k in range(n_clients)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    lat.sort()

    def pct(p):
        return lat[min(len(lat) - 1, int(len(lat) * p))] * 1e3 if lat else 0

    return {
        "clients": n_clients,
        "requests": len(lat),
        "errors": errors[0],
        "throughput_img_s": round(len(lat) / wall, 1),
        "p50_ms": round(pct(0.50), 1),
        "p95_ms": round(pct(0.95), 1),
        "p99_ms": round(pct(0.99), 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolo8_det")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max-wait-ms", type=float, default=10.0)
    ap.add_argument("--levels", default="1,2,4,8,16,32")
    ap.add_argument("--secs", type=float, default=12.0)
    ap.add_argument("--hw", default="480,640",
                    help="client image height,width — smaller bodies "
                         "isolate per-request HTTP/batcher overhead from "
                         "transport bandwidth (the axon relay's degraded "
                         "H2D binds at ~20 img/s for 480x640 raw)")
    ap.add_argument("--raw", action="store_true",
                    help="POST raw uint8 RGB bodies (application/x-raw-rgb)"
                         " instead of JPEGs — no host decode in the loop")
    args = ap.parse_args()

    from tpucv.builder import export_from_registry
    from tpucv.serving import make_server

    cfg, algo_cls, _ = export_from_registry(args.model)
    algo = algo_cls(cfg)
    variables = algo.init_variables()
    print(f"compiling serving program (batch={args.batch})...", flush=True)
    server = make_server(algo, variables, port=0, batch_size=args.batch,
                         max_wait_ms=args.max_wait_ms,
                         model_name=args.model)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    host, port = server.server_address[:2]
    url = f"http://{host}:{port}/predict"
    hw = tuple(int(x) for x in args.hw.split(","))
    if args.raw:
        bodies, headers = make_raws(hw=hw)
    else:
        bodies, headers = make_jpegs(hw=hw), {"Content-Type": "image/jpeg"}

    # warm the HTTP path once
    urllib.request.urlopen(urllib.request.Request(
        url, data=bodies[0], headers=headers), timeout=120).read()

    results = []
    prev = json.load(urllib.request.urlopen(f"http://{host}:{port}/stats"))
    for n in [int(x) for x in args.levels.split(",")]:
        r = run_level(url, bodies, n, args.secs, headers=headers)
        snap = json.load(urllib.request.urlopen(
            f"http://{host}:{port}/stats"))
        d_img = snap["images"] - prev["images"]
        d_batch = snap["batches"] - prev["batches"]
        r["mean_batch_occupancy"] = round(d_img / max(d_batch, 1), 2)
        r["rejected"] = snap.get("rejected", 0) - prev.get("rejected", 0)
        r["device_ms_per_batch"] = round(
            (snap.get("device_s", 0) - prev.get("device_s", 0))
            / max(d_batch, 1) * 1e3, 1)
        prev = snap
        results.append(r)
        print(json.dumps(r), flush=True)

    server.batcher.stop()
    server.shutdown()
    print("\n| clients | img/s | p50 ms | p95 ms | p99 ms | occupancy "
          "| device ms/batch |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['clients']} | {r['throughput_img_s']} | {r['p50_ms']} "
              f"| {r['p95_ms']} | {r['p99_ms']} "
              f"| {r['mean_batch_occupancy']} "
              f"| {r['device_ms_per_batch']} |")
    os._exit(0)


if __name__ == "__main__":
    main()
