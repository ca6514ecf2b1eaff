"""Serving layer (tpucv/serving.py + serve.py).

Fast tests drive the HTTP + micro-batching machinery with a stub
algorithm (no model compile); the slow test runs the real yolo8_det
program end-to-end over HTTP. The reference has no serving surface (its
deploy modules are empty files), so there is no parity target — these
lock tpucv's own contract."""

import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from tpucv.serving import MicroBatcher, decode_image_bytes, make_server


def _jpeg_bytes(h=48, w=64, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (h, w, 3), np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return buf.tobytes()


class _StubAlgo:
    """Duck-typed DetectionAlgorithm: one fixed box per image, whose score
    encodes the image's mean so callers can check routing."""

    class_names = ["a", "b", "c"]
    input_size = 64

    def __init__(self, fail=False, delay_s=0.0):
        self.fail = fail
        self.delay_s = delay_s
        self.batch_calls = []

    def _batched_detections(self, variables, index, batch_size, conf):
        if self.fail:
            raise RuntimeError("boom")
        if self.delay_s:
            time.sleep(self.delay_s)
        self.batch_calls.append(len(index))
        for i, (img,) in enumerate(index):
            boxes = np.array([[1.0, 2.0, 3.0, 4.0]], np.float32)
            scores = np.array([float(img.mean()) / 255.0], np.float32)
            classes = np.array([i % 3], np.int32)
            yield i, boxes, scores, classes


# ---------------------------------------------------------------- units --

def test_decode_image_bytes_roundtrip():
    img = decode_image_bytes(_jpeg_bytes())
    assert img is not None and img.shape == (48, 64, 3)
    assert img.dtype == np.uint8
    assert decode_image_bytes(b"") is None
    assert decode_image_bytes(b"not an image") is None


def test_batcher_coalesces_concurrent_requests():
    algo = _StubAlgo(delay_s=0.02)
    b = MicroBatcher(algo, {}, batch_size=4, max_wait_ms=200,
                     conf_threshold=0.5)
    b.start()
    try:
        results = [None] * 6

        def post(k):
            results[k] = b.submit(np.full((8, 8, 3), 10 * k, np.uint8))

        threads = [threading.Thread(target=post, args=(k,))
                   for k in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10)
        assert all(r is not None and "detections" in r for r in results)
        # each request got ITS OWN image's detections back
        for k, r in enumerate(results):
            assert r["detections"][0]["score"] == pytest.approx(
                10 * k / 255.0, abs=1e-6)
        snap = b.snapshot()
        assert snap["requests"] == 6
        # batch_size=4 caps groups, so 6 requests need >= 2 batches; the
        # 200 ms window + the stub's 20 ms device time makes actual
        # coalescing overwhelmingly likely but we only assert the cap
        assert 2 <= snap["batches"] <= 6
        assert max(algo.batch_calls) <= 4
        # device-time accounting: the stub sleeps 20 ms per device call,
        # so the per-batch mean must be >= that and the cumulative total
        # >= batches * 20 ms (load tests diff device_s across levels)
        assert snap["device_ms_per_batch"] >= 20.0
        assert snap["device_s"] >= snap["batches"] * 0.02
    finally:
        b.stop()


def test_batcher_propagates_device_errors():
    b = MicroBatcher(_StubAlgo(fail=True), {}, batch_size=2, max_wait_ms=1)
    b.start()
    try:
        out = b.submit(np.zeros((8, 8, 3), np.uint8))
        assert out["_status"] == 500 and "boom" in out["error"]
        # a failed slot is an error exactly once, not once per group member
        assert b.snapshot()["errors"] == 1
    finally:
        b.stop()


def test_submit_after_stop_returns_503_not_restart():
    b = MicroBatcher(_StubAlgo(), {}, batch_size=2, max_wait_ms=1)
    b.start()
    b.stop()
    out = b.submit(np.zeros((8, 8, 3), np.uint8))
    assert out["_status"] == 503 and "shutting down" in out["error"]
    # explicit restart with a fresh worker thread still works
    b.start()
    try:
        out = b.submit(np.zeros((8, 8, 3), np.uint8))
        assert "detections" in out
    finally:
        b.stop()


def test_timed_out_request_counted_once():
    algo = _StubAlgo(delay_s=0.25)
    b = MicroBatcher(algo, {}, batch_size=1, max_wait_ms=1,
                     request_timeout_s=0.05)
    b.start()
    try:
        out = b.submit(np.zeros((8, 8, 3), np.uint8))
        assert out["_status"] == 503 and "timed out" in out["error"]
        time.sleep(0.5)   # let the worker finish the abandoned slot
        snap = b.snapshot()
        # the dead slot is skipped by the worker: one error, zero requests
        assert snap["errors"] == 1
        assert snap["requests"] == 0
    finally:
        b.stop()


def test_backpressure_rejects_when_queue_full():
    algo = _StubAlgo(delay_s=0.2)
    b = MicroBatcher(algo, {}, batch_size=1, max_wait_ms=1,
                     request_timeout_s=5.0, max_queue=1)
    b.start()
    try:
        results = []
        lock = threading.Lock()

        def post():
            out = b.submit(np.zeros((8, 8, 3), np.uint8))
            with lock:
                results.append(out)

        # 6 concurrent submitters vs a 0.2 s/item worker and max_queue=1:
        # at most ~2 can be in flight/queued, the rest must fast-fail 503
        threads = [threading.Thread(target=post) for _ in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10)
        rejected = [r for r in results
                    if r.get("_status") == 503 and "overloaded" in r["error"]]
        served = [r for r in results if "detections" in r]
        assert rejected and served
        assert b.snapshot()["rejected"] == len(rejected)
    finally:
        b.stop()


# ----------------------------------------------------------- http server --

def _start(server):
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return t


def _url(server, path):
    host, port = server.server_address[:2]
    return f"http://{host}:{port}{path}"


def test_http_contract_with_stub_algo():
    server = make_server(_StubAlgo(), {}, port=0, batch_size=4,
                         max_wait_ms=5, conf_threshold=0.5, warmup=False,
                         model_name="stub")
    _start(server)
    try:
        health = json.load(urllib.request.urlopen(_url(server, "/healthz")))
        assert health["status"] == "ok" and health["model"] == "stub"

        req = urllib.request.Request(
            _url(server, "/predict"), data=_jpeg_bytes(),
            headers={"Content-Type": "image/jpeg"})
        resp = json.load(urllib.request.urlopen(req))
        assert len(resp["detections"]) == 1
        det = resp["detections"][0]
        assert det["box"] == [1.0, 2.0, 3.0, 4.0]
        assert det["label"] in ("a", "b", "c")
        assert resp["latency_ms"] >= 0

        stats = json.load(urllib.request.urlopen(_url(server, "/stats")))
        assert stats["requests"] == 1 and stats["batches"] == 1

        # undecodable body -> 400, bad route -> 404
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(urllib.request.Request(
                _url(server, "/predict"), data=b"junk"))
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(_url(server, "/nope"))
        assert e.value.code == 404
    finally:
        server.batcher.stop()
        server.shutdown()
        server.server_close()


def test_raw_rgb_route():
    """application/x-raw-rgb: uint8 RGB pixels + X-Height/X-Width headers
    skip the encode/decode round trip (and a size mismatch is a clean 400,
    not a reshape crash)."""
    server = make_server(_StubAlgo(), {}, port=0, batch_size=4,
                         max_wait_ms=5, warmup=False, model_name="stub")
    _start(server)
    try:
        h, w = 48, 64
        body = np.random.default_rng(0).integers(
            0, 255, (h, w, 3), np.uint8).tobytes()
        headers = {"Content-Type": "application/x-raw-rgb",
                   "X-Height": str(h), "X-Width": str(w)}
        resp = json.load(urllib.request.urlopen(urllib.request.Request(
            _url(server, "/predict"), data=body, headers=headers)))
        assert len(resp["detections"]) == 1

        # wrong length -> 400 (and keep-alive stays usable: the error
        # path drains nothing here because the body was fully read)
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(urllib.request.Request(
                _url(server, "/predict"), data=body[:-7], headers=headers))
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(urllib.request.Request(
                _url(server, "/predict"), data=body,
                headers={**headers, "X-Height": "nan"}))
        assert e.value.code == 400
    finally:
        server.batcher.stop()
        server.shutdown()
        server.server_close()


def test_keepalive_survives_error_responses_with_bodies():
    """A 404 POST with a body must not desync a persistent connection:
    the unread body would otherwise be parsed as the next request."""
    import http.client

    server = make_server(_StubAlgo(), {}, port=0, batch_size=2,
                         max_wait_ms=5, warmup=False, model_name="stub")
    _start(server)
    try:
        host, port = server.server_address[:2]
        conn = http.client.HTTPConnection(host, port, timeout=10)
        # POST with a body to an unknown route -> 404, body drained
        conn.request("POST", "/nope", body=b"x" * 4096)
        resp = conn.getresponse()
        assert resp.status == 404
        resp.read()
        # same socket: the next request must parse cleanly
        conn.request("GET", "/healthz")
        resp = conn.getresponse()
        assert resp.status == 200
        assert json.loads(resp.read())["status"] == "ok"
        # chunked POST -> clean 411 + connection close, not a hang
        conn.request("POST", "/predict", body=iter([b"abc"]),
                     headers={"Transfer-Encoding": "chunked"})
        resp = conn.getresponse()
        assert resp.status == 411
        resp.read()
        conn.close()
    finally:
        server.batcher.stop()
        server.shutdown()
        server.server_close()


# ------------------------------------------------------------- e2e (slow) --

@pytest.mark.slow  # full yolo8 compile
def test_serve_real_model_end_to_end():
    from tpucv.builder import export_from_registry

    cfg, algo_cls, _ = export_from_registry("yolo8_det")
    cfg.dataset.input_size = 64          # tiny CPU compile
    cfg.decode.pre_nms_topk = 64
    cfg.decode.max_det = 10
    cfg.train.mixed_precision = False
    algo = algo_cls(cfg)
    variables = algo.init_variables()
    server = make_server(algo, variables, port=0, batch_size=2,
                         max_wait_ms=5, conf_threshold=0.01,
                         model_name="yolo8_det")
    _start(server)
    try:
        req = urllib.request.Request(
            _url(server, "/predict"), data=_jpeg_bytes(h=96, w=128),
            headers={"Content-Type": "image/jpeg"})
        resp = json.load(urllib.request.urlopen(req, timeout=120))
        assert "detections" in resp
        for det in resp["detections"]:
            x1, y1, x2, y2 = det["box"]
            assert x1 <= x2 and y1 <= y2
            assert 0.0 <= det["score"] <= 1.0
            assert det["label"] in algo.class_names
    finally:
        server.batcher.stop()
        server.shutdown()
        server.server_close()
