"""ctypes wrapper over the native host image pipeline (imagepipe.cpp).

Threaded JPEG decode + nearest letterbox in C++ — the host half of the
eval/predict input path (reference: cv2 decode + letterbox at
``core/utils/image_process.py:7-66``; tpucv keeps resize/pad/normalize
on-chip and the host does JPEG decode only). All entry points return None /
raise gracefully when the native library is unavailable, and callers fall
back to the cv2 path; per-image decode failures (non-JPEG, CMYK, corrupt)
are reported via the ``ok`` mask so the caller can recover just those
images with cv2.
"""

from __future__ import annotations

import ctypes as C
import os
from typing import List, Optional, Tuple

import numpy as np

from tpucv.native import load

_pu8 = C.POINTER(C.c_uint8)
_pi32 = C.POINTER(C.c_int32)
_pf32 = C.POINTER(C.c_float)


def _lib():
    lib = load("imagepipe")
    if lib is None:
        return None
    if not getattr(lib, "_tpucv_sigs", False):
        lib.tpucv_decode_to_canvas.restype = C.c_int
        lib.tpucv_decode_to_canvas.argtypes = [
            C.POINTER(C.c_char_p), C.c_int, C.c_int,
            _pu8, _pi32, _pi32, _pu8, C.c_int]
        lib.tpucv_decode_letterbox.restype = C.c_int
        lib.tpucv_decode_letterbox.argtypes = [
            C.POINTER(C.c_char_p), C.c_int, C.c_int, C.c_int, C.c_uint8,
            _pu8, _pf32, _pi32, _pi32, _pu8, C.c_int]
        lib.tpucv_decode_jpeg.restype = C.c_int
        lib.tpucv_decode_jpeg.argtypes = [
            C.c_char_p, _pu8, C.c_int64, _pi32, _pi32]
        lib.tpucv_nearest_resize.restype = None
        lib.tpucv_nearest_resize.argtypes = [
            _pu8, C.c_int, C.c_int, _pu8, C.c_int, C.c_int]
        lib._tpucv_sigs = True
    return lib


def available() -> bool:
    return _lib() is not None


def _paths_array(paths: List[str]):
    arr = (C.c_char_p * len(paths))()
    arr[:] = [os.fsencode(p) for p in paths]
    return arr


def decode_to_canvas(paths: List[str], canvas: int,
                     out: Optional[np.ndarray] = None,
                     n_threads: int = 0):
    """Decode JPEGs into the top-left of per-image uint8 canvases (the
    device-letterbox input layout of ``algorithms/base.py``). Oversized
    images are nearest pre-shrunk to fit, matching the python fallback's
    geometry exactly.

    Returns ``(out, hw, orig, ok)`` — out (N, canvas, canvas, 3) uint8,
    hw/orig (N, 2) int32 placed and original dims, ok (N,) bool — or None
    when the native library is unavailable. ``out`` may be a preallocated
    (>=N, canvas, canvas, 3) C-contiguous uint8 array; rows [0, N) of it
    are zeroed and filled.
    """
    lib = _lib()
    if lib is None:
        return None
    n = len(paths)
    if out is None:
        out = np.zeros((n, canvas, canvas, 3), np.uint8)
    else:
        assert out.flags.c_contiguous and out.dtype == np.uint8 \
            and out.shape[1:] == (canvas, canvas, 3) and out.shape[0] >= n
        out[:n] = 0
    hw = np.ones((n, 2), np.int32)
    orig = np.ones((n, 2), np.int32)
    ok = np.zeros(n, np.uint8)
    if n:
        lib.tpucv_decode_to_canvas(
            _paths_array(paths), n, canvas,
            out.ctypes.data_as(_pu8), hw.ctypes.data_as(_pi32),
            orig.ctypes.data_as(_pi32), ok.ctypes.data_as(_pu8),
            n_threads)
    return out, hw, orig, ok.astype(bool)


def decode_letterbox(paths: List[str], size: Tuple[int, int],
                     fill: int = 128, n_threads: int = 0):
    """Decode + full host letterbox onto an (H, W) canvas (geometry of
    ``utils/image_process.letter_box``). Returns ``(out, scale, pad, orig,
    ok)`` or None when unavailable."""
    lib = _lib()
    if lib is None:
        return None
    n = len(paths)
    H, W = size
    out = np.empty((n, H, W, 3), np.uint8)
    scale = np.ones(n, np.float32)
    pad = np.zeros((n, 2), np.int32)
    orig = np.ones((n, 2), np.int32)
    ok = np.zeros(n, np.uint8)
    if n:
        lib.tpucv_decode_letterbox(
            _paths_array(paths), n, H, W, fill,
            out.ctypes.data_as(_pu8), scale.ctypes.data_as(_pf32),
            pad.ctypes.data_as(_pi32), orig.ctypes.data_as(_pi32),
            ok.ctypes.data_as(_pu8), n_threads)
    return out, scale, pad, orig, ok.astype(bool)


def decode_jpeg(path: str) -> Optional[np.ndarray]:
    """Decode one JPEG to RGB uint8 HWC; None on any failure (caller falls
    back to cv2)."""
    lib = _lib()
    if lib is None:
        return None
    h = C.c_int32(0)
    w = C.c_int32(0)
    # first call with a probe buffer sized for typical images; retry once
    # with the exact size if it was too small
    cap = 1 << 22  # 4 MiB ~ covers up to ~1180x1180 RGB
    buf = np.empty(cap, np.uint8)
    rc = lib.tpucv_decode_jpeg(os.fsencode(path), buf.ctypes.data_as(_pu8),
                               cap, C.byref(h), C.byref(w))
    if rc == -2:
        cap = int(h.value) * int(w.value) * 3
        buf = np.empty(cap, np.uint8)
        rc = lib.tpucv_decode_jpeg(os.fsencode(path),
                                   buf.ctypes.data_as(_pu8), cap,
                                   C.byref(h), C.byref(w))
    if rc != 0:
        return None
    return buf[: h.value * w.value * 3].reshape(h.value, w.value, 3)


def nearest_resize(img: np.ndarray, size: Tuple[int, int]) -> Optional[np.ndarray]:
    """cv2.resize(INTER_NEAREST)-exact uint8 RGB resize; None if the
    library is unavailable."""
    lib = _lib()
    if lib is None:
        return None
    h, w = size
    src = np.ascontiguousarray(img, np.uint8)
    dst = np.empty((h, w, 3), np.uint8)
    lib.tpucv_nearest_resize(src.ctypes.data_as(_pu8), src.shape[0],
                             src.shape[1], dst.ctypes.data_as(_pu8), h, w)
    return dst
