"""ctypes bindings for the native (C++) separable bilinear resize.

Builds ``native/rir_resize.cc`` on first use (same pattern as
``native_decode``) and exposes :func:`resize_bilinear_native`, the host
half of multi-scale descriptor extraction (reference contract:
utils/helpfunc.py:30-46 resizes every eval image per scale).  The
triangle-kernel weights are identical to
``index.extract._resize_taps`` / ``jax.image.resize(method="bilinear")``;
the C++ version exists because at the 1024px eval operating point the
numpy path costs ~10x more on the 1-core rig (temporaries + gather),
which starves the chip in the streaming extraction pipeline.

Falls back loudly to ``None`` when the toolchain is missing — callers
keep the numpy implementation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["native_available", "resize_bilinear_native"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "rir_resize.cc")
_LIB_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB = os.path.join(_LIB_DIR, "librir_resize.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    os.makedirs(_LIB_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-o", _LIB,
           _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        # retry without -march=native (portable fallback)
        try:
            subprocess.run(["g++", "-O3", "-fPIC", "-shared", "-o", _LIB,
                            _SRC], check=True, capture_output=True,
                           timeout=120)
            return True
        except (subprocess.CalledProcessError, FileNotFoundError,
                subprocess.TimeoutExpired):
            return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB)
        lib.rir_resize_bilinear.restype = ctypes.c_int
        lib.rir_resize_bilinear.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def resize_bilinear_native(img: np.ndarray, h: int, w: int) -> np.ndarray | None:
    """Resize [H, W, C] float32 to [h, w, C] via the native library.

    Returns None when the native library is unavailable or the call
    fails (caller falls back to the numpy path).
    """
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    out = np.empty((h, w, img.shape[2]), np.float32)
    rc = lib.rir_resize_bilinear(
        img.ctypes.data_as(ctypes.c_void_p), img.shape[0], img.shape[1],
        img.shape[2], out.ctypes.data_as(ctypes.c_void_p), h, w,
    )
    return out if rc == 0 else None
