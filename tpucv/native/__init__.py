"""Native (C++) runtime components, loaded via ctypes.

The compute path of tpucv is JAX/XLA/Pallas; the pieces the reference
delegates to native code outside the accelerator — pycocotools' C COCOeval
(reference ``core/metrics/mAP.py:10-11``) — live here as C++ compiled
on demand with g++. Everything degrades gracefully: if no compiler or the
build fails, callers fall back to the pure-numpy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS: dict = {}

# per-library extra link/compile flags
_FLAGS = {
    "imagepipe": ["-ljpeg", "-lpthread"],
}


def _build(name: str) -> str | None:
    src = os.path.join(_DIR, f"{name}.cpp")
    lib = os.path.join(_DIR, f"lib{name}.so")
    try:
        if os.path.exists(lib) and \
                os.path.getmtime(lib) >= os.path.getmtime(src):
            return lib
    except OSError:            # .so shipped without its source: use as-is
        return lib
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", lib + ".tmp", src] + _FLAGS.get(name, []),
            check=True, capture_output=True, timeout=120)
        os.replace(lib + ".tmp", lib)
        return lib
    except (OSError, subprocess.SubprocessError):
        return None


def load(name: str) -> ctypes.CDLL | None:
    """Build (if needed) and dlopen lib<name>.so; None when unavailable."""
    with _LOCK:
        if name not in _LIBS:
            lib = _build(name)
            try:
                _LIBS[name] = ctypes.CDLL(lib) if lib else None
            except OSError:
                _LIBS[name] = None
        return _LIBS[name]
