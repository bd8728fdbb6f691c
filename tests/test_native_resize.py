"""Native C++ separable resize == numpy sparse-tap == dense-matrix resize.

The host-side multi-scale resize of descriptor extraction (reference
contract utils/helpfunc.py:30-46) has three implementations that must
agree: the dense [in, out] triangle-weight matrix (ground truth,
index.extract._resize_weights), the sparse-tap numpy path, and
native/rir_resize.cc.  ``resize_bilinear_np`` prefers native and falls
back to numpy; both must match the dense form to float rounding.
"""

import numpy as np
import pytest

from research_image_retrieval_tpu.data.native_resize import (
    native_available,
    resize_bilinear_native,
)
from research_image_retrieval_tpu.index.extract import (
    _resize_weights,
    resize_bilinear_np,
)

SHAPES = [
    ((57, 43), (40, 30)),    # downscale (antialiased)
    ((33, 21), (64, 48)),    # upscale
    ((48, 48), (34, 67)),    # mixed
    ((5, 5), (5, 5)),        # identity
    ((7, 3), (2, 9)),        # extreme aspect change
    ((256, 192), (181, 136)),  # 2^-1/2 eval scale
]


def _dense(img: np.ndarray, h: int, w: int) -> np.ndarray:
    wh = _resize_weights(img.shape[0], h)
    ww = _resize_weights(img.shape[1], w)
    out = np.einsum("io,ijc->ojc", wh, img, optimize=True)
    return np.einsum("jo,ijc->ioc", ww, out, optimize=True)


@pytest.mark.parametrize("in_shape,out_shape", SHAPES)
def test_resize_matches_dense(in_shape, out_shape):
    rng = np.random.default_rng(0)
    img = rng.standard_normal(in_shape + (3,)).astype(np.float32)
    want = _dense(img, *out_shape)
    got = resize_bilinear_np(img, *out_shape)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
@pytest.mark.parametrize("in_shape,out_shape", SHAPES)
def test_native_matches_dense(in_shape, out_shape):
    rng = np.random.default_rng(1)
    img = rng.standard_normal(in_shape + (3,)).astype(np.float32)
    want = _dense(img, *out_shape)
    got = resize_bilinear_native(img, *out_shape)
    assert got is not None
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
def test_native_noncontiguous_and_single_channel():
    rng = np.random.default_rng(2)
    # non-contiguous view (crop) — wrapper must make it contiguous
    big = rng.standard_normal((64, 64, 3)).astype(np.float32)
    crop = big[5:45, 7:39]
    got = resize_bilinear_native(crop, 21, 17)
    want = _dense(np.ascontiguousarray(crop), 21, 17)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    gray = rng.standard_normal((40, 30, 1)).astype(np.float32)
    got = resize_bilinear_native(gray, 25, 45)
    want = _dense(gray, 25, 45)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
def test_native_rejects_bad_args():
    import ctypes

    from research_image_retrieval_tpu.data import native_resize

    lib = native_resize._load()
    assert lib.rir_resize_bilinear(None, 4, 4, 3, None, 2, 2) != 0
    buf = np.zeros((4, 4, 3), np.float32)
    out = np.zeros((2, 2, 3), np.float32)
    assert lib.rir_resize_bilinear(
        buf.ctypes.data_as(ctypes.c_void_p), 0, 4, 3,
        out.ctypes.data_as(ctypes.c_void_p), 2, 2,
    ) != 0
