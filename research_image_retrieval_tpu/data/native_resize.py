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

import numpy as np

from research_image_retrieval_tpu.data._native_build import NativeLib

__all__ = ["native_available", "resize_bilinear_native"]


def _declare(lib: ctypes.CDLL) -> None:
    lib.rir_resize_bilinear.restype = ctypes.c_int
    lib.rir_resize_bilinear.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]


_native = NativeLib("rir_resize.cc", "librir_resize.so", _declare,
                    try_march_native=True)
_load = _native.load


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
