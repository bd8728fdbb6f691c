"""ctypes bindings for the native (C++) JPEG decode core.

Builds ``native/rir_decoder.cc`` on first use into a per-repo cache and
loads it via ctypes (no pybind11 in this environment).  Decoding happens
outside the GIL with DCT-domain prescaling, which is the throughput lever
for the >=2k images/sec/chip extraction target (BASELINE.json): a Python
thread pool plus this decoder keeps all host cores busy.

Falls back to cv2/PIL decoding when the toolchain or libjpeg is missing.
"""

from __future__ import annotations

import ctypes

import numpy as np

from research_image_retrieval_tpu.data._native_build import NativeLib

__all__ = ["native_available", "decode_jpeg", "decode_jpeg_batch",
           "NativeDecoder"]


def _declare(lib: ctypes.CDLL) -> None:
    lib.rir_decode_jpeg.restype = ctypes.c_int
    lib.rir_decode_jpeg.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.rir_jpeg_dims.restype = ctypes.c_int
    lib.rir_jpeg_dims.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.rir_decode_batch.restype = None
    lib.rir_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    pi = ctypes.POINTER(ctypes.c_int)
    lib.rir_jpeg_coeff_dims.restype = ctypes.c_int
    lib.rir_jpeg_coeff_dims.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, pi, pi, pi, pi, pi, pi, pi,
    ]
    lib.rir_jpeg_coeffs.restype = ctypes.c_int
    lib.rir_jpeg_coeffs.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
        ctypes.c_void_p, ctypes.c_void_p,
        pi, pi, pi, pi, pi, pi, pi,
    ]


_native = NativeLib("rir_decoder.cc", "librir_decoder.so", _declare,
                    extra_flags=("-ljpeg", "-lpthread"))
_load = _native.load


def native_available() -> bool:
    return _load() is not None


def _fallback_decode(data: bytes) -> np.ndarray:
    try:
        import cv2

        img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError("undecodable JPEG data")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    except ImportError:
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


def decode_jpeg(data: bytes, max_side: int = 0) -> np.ndarray:
    """Decode JPEG bytes to RGB uint8 [H, W, 3].

    max_side > 0 enables DCT prescaling: the output's max side is the
    smallest 1/2^k scaling still >= max_side (final exact resizing is the
    caller's choice).
    """
    lib = _load()
    if lib is None:
        return _fallback_decode(data)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.rir_jpeg_dims(data, len(data), max_side, ctypes.byref(h),
                           ctypes.byref(w))
    if rc != 0:
        return _fallback_decode(data)
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.rir_decode_jpeg(
        data, len(data), out.ctypes.data_as(ctypes.c_void_p), out.nbytes,
        ctypes.byref(h), ctypes.byref(w), max_side,
    )
    if rc != 0:
        return _fallback_decode(data)
    return out


def decode_jpeg_batch(datas: list[bytes], max_side: int = 0,
                      num_threads: int = 8) -> list[np.ndarray]:
    """Decode a batch of JPEGs in parallel native threads (GIL-free)."""
    lib = _load()
    if lib is None:
        return [_fallback_decode(d) for d in datas]
    n = len(datas)
    if n == 0:
        return []
    hs = (ctypes.c_int * n)()
    ws = (ctypes.c_int * n)()
    status = (ctypes.c_int * n)()
    # probe dims to size output buffers
    outs: list[np.ndarray] = []
    for d in datas:
        h = ctypes.c_int()
        w = ctypes.c_int()
        rc = lib.rir_jpeg_dims(d, len(d), max_side, ctypes.byref(h),
                               ctypes.byref(w))
        if rc != 0:
            h.value, w.value = 1, 1  # decode will fail; fallback below
        outs.append(np.empty((max(h.value, 1), max(w.value, 1), 3), np.uint8))

    data_ptrs = (ctypes.c_char_p * n)(*datas)
    len_arr = (ctypes.c_size_t * n)(*[len(d) for d in datas])
    out_ptrs = (ctypes.c_void_p * n)(
        *[o.ctypes.data_as(ctypes.c_void_p).value for o in outs]
    )
    caps = (ctypes.c_int * n)(*[o.nbytes for o in outs])
    lib.rir_decode_batch(
        data_ptrs, len_arr, out_ptrs, caps, hs, ws, status, n, max_side,
        num_threads,
    )
    result = []
    for i in range(n):
        if status[i] != 0:
            result.append(_fallback_decode(datas[i]))
        else:
            result.append(outs[i][: hs[i], : ws[i]])
    return result


class JpegCoeffs:
    """Entropy-decoded JPEG: quantized DCT coefficients (top-left k x k
    of each 8x8 block) + dequant tables + true pixel dims.  The device
    finishes the decode (dequant + iDCT + chroma upsample + YCbCr->RGB,
    ops/jpeg_decode.py) — ~(64/k^2)/3 x fewer wire bytes than RGB uint8
    through a slow host->device link."""

    __slots__ = ("coef_y", "coef_c", "quant_y", "quant_c", "h", "w",
                 "subsamp", "k", "out_block", "target_hw")

    def __init__(self, coef_y, coef_c, quant_y, quant_c, h, w, subsamp, k):
        self.coef_y = coef_y      # [by, bx, k, k] int16
        self.coef_c = coef_c      # [2, cby, cbx, k, k] int16
        self.quant_y = quant_y    # [k, k] float32
        self.quant_c = quant_c    # [k, k] float32
        self.h = h                # true pixel dims (canvas is by*8 x bx*8)
        self.w = w
        self.subsamp = subsamp    # 0 gray, 1 = 4:4:4, 2 = 4:2:0
        self.k = k
        # set by the loader: device decode block size (n<8 = DCT-domain
        # prescale by 8/n) and the post-decode thumbnail target dims
        self.out_block = 8
        self.target_hw = None

    @property
    def decoded_hw(self) -> tuple:
        """Valid pixel extents AFTER device decode at ``out_block``."""
        n = self.out_block
        if n == 8:
            return (self.h, self.w)
        return (max(1, int(round(self.h * n / 8))),
                max(1, int(round(self.w * n / 8))))

    @property
    def nbytes(self) -> int:
        return self.coef_y.nbytes + self.coef_c.nbytes

    @property
    def shape(self):  # canvas pixel dims, so bucketing code can treat
        # JpegCoeffs like an image array
        return (self.coef_y.shape[0] * 8, self.coef_y.shape[1] * 8, 3)


def decode_jpeg_coeffs(data: bytes, k: int = 4) -> "JpegCoeffs | None":
    """Host HALF of the split decode: entropy-decode ``data`` and return
    truncated quantized DCT coefficients, or None when the native lib is
    unavailable or the JPEG layout is unsupported (caller falls back to
    full host decode).  4:2:0, 4:4:4 and grayscale layouts are handled;
    grayscale returns zero chroma coefficients (neutral color)."""
    lib = _load()
    if lib is None:
        return None
    i = ctypes.c_int
    h, w, by, bx, cby, cbx, ss = i(), i(), i(), i(), i(), i(), i()
    rc = lib.rir_jpeg_coeff_dims(
        data, len(data), ctypes.byref(h), ctypes.byref(w), ctypes.byref(by),
        ctypes.byref(bx), ctypes.byref(cby), ctypes.byref(cbx),
        ctypes.byref(ss))
    if rc != 0:
        return None
    coef_y = np.empty((by.value, bx.value, k, k), np.int16)
    n_c = (1, cby.value, cbx.value) if ss.value else (0, 0, 0)
    coef_c = np.zeros((2, max(n_c[1], 1), max(n_c[2], 1), k, k), np.int16)
    quant_y = np.empty((k, k), np.float32)
    quant_c = np.ones((k, k), np.float32)
    rc = lib.rir_jpeg_coeffs(
        data, len(data), k,
        coef_y.ctypes.data_as(ctypes.c_void_p), coef_y.nbytes,
        coef_c.ctypes.data_as(ctypes.c_void_p), coef_c.nbytes,
        quant_y.ctypes.data_as(ctypes.c_void_p),
        quant_c.ctypes.data_as(ctypes.c_void_p),
        ctypes.byref(h), ctypes.byref(w), ctypes.byref(by), ctypes.byref(bx),
        ctypes.byref(cby), ctypes.byref(cbx), ctypes.byref(ss))
    if rc != 0:
        return None
    if ss.value == 0:
        # grayscale: synthesize neutral chroma at the 4:2:0 grid so the
        # device program sees a uniform layout
        coef_c = np.zeros((2, (by.value + 1) // 2, (bx.value + 1) // 2,
                           k, k), np.int16)
        ss.value = 2 if by.value % 2 == 0 and bx.value % 2 == 0 else 1
        if ss.value == 1:
            coef_c = np.zeros((2, by.value, bx.value, k, k), np.int16)
    return JpegCoeffs(coef_y, coef_c, quant_y, quant_c, h.value, w.value,
                      ss.value, k)


class NativeDecoder:
    """Transform-compatible decoder: bytes -> RGB array with prescale."""

    def __init__(self, max_side: int = 0):
        self.max_side = max_side

    def __call__(self, data: bytes) -> np.ndarray:
        return decode_jpeg(data, self.max_side)
