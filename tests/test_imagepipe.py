"""Native host image pipeline (tpucv/native/imagepipe.cpp) vs the cv2 path.

The native pipeline must be BIT-IDENTICAL to the cv2 implementation it
replaces (both decode through libjpeg-turbo; the nearest resampler copies
cv2.resize INTER_NEAREST's int-truncation geometry), so every assertion
here is exact equality — any drift would silently move detections off the
reference-parity path.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tpucv.native import imagepipe as ip

pytestmark = pytest.mark.skipif(
    not ip.available(), reason="native imagepipe unavailable (no g++/libjpeg)")


def _jpg(tmp_path, name, img, quality=92):
    p = str(tmp_path / name)
    assert cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                       [cv2.IMWRITE_JPEG_QUALITY, quality])
    return p


def _rand_rgb(rng, h, w):
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    return cv2.GaussianBlur(img, (5, 5), 2)  # realistic JPEG content


def _cv2_read(p):
    bgr = cv2.imread(p, cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION)
    return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)


@pytest.mark.parametrize("shapes", [
    (480, 640, 213, 284), (37, 53, 640, 640),
    (640, 640, 320, 213), (101, 99, 384, 384),
])
def test_nearest_resize_matches_cv2_exactly(shapes):
    sh, sw, dh, dw = shapes
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (sh, sw, 3)).astype(np.uint8)
    ours = ip.nearest_resize(img, (dh, dw))
    ref = cv2.resize(img, (dw, dh), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(ours, ref)


def test_decode_jpeg_bit_identical_to_cv2(tmp_path):
    rng = np.random.default_rng(1)
    for i, (h, w) in enumerate([(480, 640), (333, 500), (50, 60)]):
        p = _jpg(tmp_path, f"c{i}.jpg", _rand_rgb(rng, h, w))
        nat = ip.decode_jpeg(p)
        assert nat is not None and nat.shape == (h, w, 3)
        np.testing.assert_array_equal(nat, _cv2_read(p))


def test_decode_jpeg_grayscale_expands_to_rgb(tmp_path):
    g = np.random.default_rng(2).integers(0, 256, (64, 48)).astype(np.uint8)
    p = str(tmp_path / "gray.jpg")
    assert cv2.imwrite(p, g)
    nat = ip.decode_jpeg(p)
    np.testing.assert_array_equal(nat, _cv2_read(p))


def test_decode_jpeg_rejects_non_jpeg_and_corrupt(tmp_path):
    png = str(tmp_path / "a.png")
    assert cv2.imwrite(png, np.zeros((8, 8, 3), np.uint8))
    assert ip.decode_jpeg(png) is None
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"\xff\xd8\xff\xe0junk")
    assert ip.decode_jpeg(bad) is None
    assert ip.decode_jpeg(str(tmp_path / "missing.jpg")) is None


def test_decode_jpeg_large_image_retry_path(tmp_path):
    # > the 4 MiB probe buffer: exercises the -2 retry branch
    rng = np.random.default_rng(3)
    p = _jpg(tmp_path, "big.jpg", _rand_rgb(rng, 1100, 1400))
    nat = ip.decode_jpeg(p)
    assert nat is not None and nat.shape == (1100, 1400, 3)
    np.testing.assert_array_equal(nat, _cv2_read(p))


def test_decode_to_canvas_matches_python_path(tmp_path):
    """Batch decode into the eval harness's raw-canvas layout, including
    the oversized-image nearest pre-shrink (algorithms/base.py)."""
    rng = np.random.default_rng(4)
    sizes = [(480, 640), (427, 640), (720, 960), (33, 47)]
    paths = [_jpg(tmp_path, f"d{i}.jpg", _rand_rgb(rng, h, w))
             for i, (h, w) in enumerate(sizes)]
    C = 640
    out, hw, orig, ok = ip.decode_to_canvas(paths, C)
    assert ok.all()
    for j, p in enumerate(paths):
        img = _cv2_read(p)
        oh, ow = img.shape[:2]
        if oh > C or ow > C:
            pre = C / max(oh, ow)
            img = cv2.resize(img, (int(ow * pre), int(oh * pre)),
                             interpolation=cv2.INTER_NEAREST)
        h, w = img.shape[:2]
        ref = np.zeros((C, C, 3), np.uint8)
        ref[:h, :w] = img
        np.testing.assert_array_equal(out[j], ref)
        assert tuple(hw[j]) == (h, w) and tuple(orig[j]) == (oh, ow)


def test_decode_to_canvas_failure_mask_and_prealloc(tmp_path):
    rng = np.random.default_rng(5)
    good = _jpg(tmp_path, "g.jpg", _rand_rgb(rng, 64, 80))
    bad = str(tmp_path / "x.jpg")
    with open(bad, "wb") as f:
        f.write(b"nope")
    prealloc = np.full((3, 64, 64, 3), 7, np.uint8)  # stale contents
    out, hw, orig, ok = ip.decode_to_canvas([bad, good], 64, out=prealloc)
    assert out is prealloc
    assert ok.tolist() == [False, True]
    assert (out[0] == 0).all()                      # failed row zeroed
    # 64x80 exceeds the 64-canvas: nearest pre-shrink by 64/80
    assert tuple(hw[1]) == (51, 64) and tuple(orig[1]) == (64, 80)
    assert (prealloc[2] == 7).all()                 # rows past n untouched


def test_decode_parity_gate_disables_native(tmp_path, monkeypatch):
    """If the system libjpeg ever decoded differently from cv2, the
    one-time parity check must disable the whole native decode surface so
    mixed native/cv2 batches can't drift off the parity path."""
    rng = np.random.default_rng(6)
    p = _jpg(tmp_path, "p.jpg", _rand_rgb(rng, 32, 32))
    assert ip._decode_parity_ok()          # this host: turbo == turbo
    monkeypatch.setitem(ip._PARITY, "ok", False)
    assert not ip.available()
    assert ip.decode_jpeg(p) is None
    assert ip.decode_to_canvas([p], 64) is None


def test_nearest_resize_rejects_non_rgb():
    with pytest.raises(ValueError):
        ip.nearest_resize(np.zeros((8, 8), np.uint8), (4, 4))


def test_decode_to_canvas_rejects_bad_prealloc(tmp_path):
    rng = np.random.default_rng(8)
    p = _jpg(tmp_path, "b.jpg", _rand_rgb(rng, 16, 16))
    with pytest.raises(ValueError):
        ip.decode_to_canvas([p], 64, out=np.zeros((1, 32, 32, 3), np.uint8))
    with pytest.raises(ValueError):
        ip.decode_to_canvas(
            [p], 64, out=np.zeros((1, 64, 64, 3), np.int32))


@pytest.mark.slow
def test_batched_detections_native_equals_fallback(tmp_path, monkeypatch):
    """Harness-level: the eval loop's native batch-decode fast path yields
    detections identical to the per-image python path on a file-backed
    synthetic COCO root (same weights, same images)."""
    import subprocess
    import sys

    subprocess.run(
        [sys.executable, "scripts/make_synthetic_coco.py",
         "--root", str(tmp_path), "--n", "4"],
        check=True, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    from tpucv.builder import export_from_registry
    from tpucv.data.coco import COCOIndex

    cfg, algo_cls, _ = export_from_registry("yolo8_det")
    algo = algo_cls(cfg)
    variables = algo.init_variables(algo.build_model())
    index = COCOIndex(
        os.path.join(tmp_path, "annotations/instances_val2017.json"),
        os.path.join(tmp_path, "val2017"))

    def run():
        return [(i, b.copy(), s.copy(), c.copy()) for i, b, s, c in
                algo._batched_detections(variables, index, 2, 0.001)]

    native = run()
    monkeypatch.setattr(ip, "available", lambda: False)
    fallback = run()
    assert len(native) == len(fallback) > 0
    for (i1, b1, s1, c1), (i2, b2, s2, c2) in zip(native, fallback):
        assert i1 == i2
        np.testing.assert_array_equal(b1, b2)
        np.testing.assert_array_equal(s1, s2)
        np.testing.assert_array_equal(c1, c2)


def test_read_image_native_path_matches_cv2(tmp_path):
    """utils.image_process.read_image routes JPEGs through the native
    decoder; result must equal the cv2 decode it replaces, and non-JPEG
    must still work via the fallback."""
    from tpucv.utils.image_process import read_image
    rng = np.random.default_rng(7)
    p = _jpg(tmp_path, "r.jpg", _rand_rgb(rng, 123, 234))
    np.testing.assert_array_equal(read_image(p), _cv2_read(p))
    png = str(tmp_path / "r.png")
    rgb = rng.integers(0, 256, (32, 40, 3)).astype(np.uint8)
    assert cv2.imwrite(png, cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
    np.testing.assert_array_equal(read_image(png), rgb)
