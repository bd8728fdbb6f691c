"""Split JPEG decode: host entropy decode + device dequant/iDCT/color.

Pins the device decode (ops/jpeg_decode.py) against libjpeg's full host
decode, and the DCT-coefficient extraction pipeline
(``extract_vectors(dct_decode=True)``) against the RGB uint8 pipeline —
the parity gate VERDICT r4 asked for on the north-star on-device decode
(reference decode surface being replaced:
dataset/configdataset.py:294-302).
"""

import os
import tempfile

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from research_image_retrieval_tpu.data.native_decode import (  # noqa: E402
    JpegCoeffs,
    decode_jpeg,
    decode_jpeg_coeffs,
    native_available,
)
from research_image_retrieval_tpu.ops.jpeg_decode import (  # noqa: E402
    dct_decode_rgb,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native decoder unavailable"
)


def _structured_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        128 + 100 * np.sin(xx / 17.0) * np.cos(yy / 23.0),
        128 + 90 * np.cos(xx / 11.0),
        128 + 80 * np.sin((xx + yy) / 29.0),
    ], -1)
    return np.clip(img + rng.normal(0, 6, img.shape), 0, 255).astype(np.uint8)


def _jpeg_bytes(img, quality=90, sampling=None):
    import cv2

    flags = [cv2.IMWRITE_JPEG_QUALITY, quality]
    if sampling is not None:
        flags += [cv2.IMWRITE_JPEG_SAMPLING_FACTOR, sampling]
    ok, enc = cv2.imencode(".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                           flags)
    assert ok
    return enc.tobytes()


def _device_decode(co: JpegCoeffs, out_block=None):
    n = out_block or co.out_block
    dec = np.asarray(dct_decode_rgb(
        co.coef_y[None], co.coef_c[None], co.quant_y[None],
        co.quant_c[None], co.subsamp, n))[0]
    dh, dw = ((co.h, co.w) if n == 8
              else (int(round(co.h * n / 8)), int(round(co.w * n / 8))))
    return dec[:dh, :dw]


def test_k8_matches_libjpeg_within_integer_idct_tolerance():
    data = _jpeg_bytes(_structured_image(200, 312))
    ref = decode_jpeg(data).astype(np.float32)
    co = decode_jpeg_coeffs(data, k=8)
    assert co is not None and co.subsamp == 2
    dec = _device_decode(co)
    # libjpeg uses integer iDCT + integer fancy upsampling; the float
    # device decode agrees to a few LSBs
    assert np.abs(dec - ref).max() < 6.0
    assert np.abs(dec - ref).mean() < 1.0


def test_truncation_quality_degrades_gracefully():
    data = _jpeg_bytes(_structured_image(160, 160, seed=1))
    ref = decode_jpeg(data).astype(np.float32)
    errs = []
    for k in (8, 4, 2):
        co = decode_jpeg_coeffs(data, k=k)
        errs.append(np.abs(_device_decode(co) - ref).mean())
    assert errs[0] < errs[1] < errs[2]
    assert errs[1] < 8.0  # k=4 stays a usable image


def test_wire_bytes_shrink():
    data = _jpeg_bytes(_structured_image(256, 256, seed=2))
    ref = decode_jpeg(data)
    co4 = decode_jpeg_coeffs(data, k=4)
    assert co4.nbytes * 3 < ref.nbytes  # > 3x fewer bytes at k=4


def test_grayscale_and_444_layouts():
    img = _structured_image(120, 88, seed=3)
    import cv2

    ok, encg = cv2.imencode(".jpg", img[:, :, 0])
    cog = decode_jpeg_coeffs(encg.tobytes(), k=8)
    assert cog is not None
    refg = decode_jpeg(encg.tobytes()).astype(np.float32)
    assert np.abs(_device_decode(cog) - refg).max() < 6.0

    data444 = _jpeg_bytes(img, quality=95,
                          sampling=__import__("cv2").IMWRITE_JPEG_SAMPLING_FACTOR_444)
    co4 = decode_jpeg_coeffs(data444, k=8)
    assert co4 is not None and co4.subsamp == 1
    ref4 = decode_jpeg(data444).astype(np.float32)
    assert np.abs(_device_decode(co4) - ref4).max() < 6.0


def test_dct_domain_downscale():
    data = _jpeg_bytes(_structured_image(192, 256, seed=4))
    import cv2

    ref = decode_jpeg(data)
    co = decode_jpeg_coeffs(data, k=4)
    half = _device_decode(co, out_block=4)
    ref_half = cv2.resize(ref, (128, 96),
                          interpolation=cv2.INTER_AREA).astype(np.float32)
    assert half.shape == (96, 128, 3)
    assert np.abs(half - ref_half).mean() < 4.0


# ---------------------------------------------------------------------------
# pipeline parity


def _masked_pixel_extractor():
    """Masked GeM over raw pixels — a tiny masked-extract-capable model
    standing in for a backbone (exercises the full bucket machinery
    without a 25M-param network)."""
    from research_image_retrieval_tpu.ops import gem_pool, hw_mask, l2_normalize

    def extract(x, valid_hw):
        mask = hw_mask(x.shape[1], x.shape[2], valid_hw)
        pooled = gem_pool(jnp.abs(x) + 0.05, p=3.0, valid_hw=mask)
        return l2_normalize(pooled)

    return extract


def _write_jpegs(td, imgs):
    import cv2

    paths = []
    for i, im in enumerate(imgs):
        p = os.path.join(td, f"{i:03d}.jpg")
        cv2.imwrite(p, cv2.cvtColor(im, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 92])
        paths.append(p)
    return paths


@pytest.mark.parametrize("scales", [(1.0,), (1.0, 0.5)])
def test_dct_pipeline_matches_rgb_pipeline(scales):
    from research_image_retrieval_tpu.data import ImageFromList
    from research_image_retrieval_tpu.data.transforms import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )
    from research_image_retrieval_tpu.index import extract_vectors

    imgs = [_structured_image(120, 152, seed=10),
            _structured_image(152, 120, seed=11),
            _structured_image(88, 88, seed=12),
            _structured_image(140, 104, seed=13)]
    extract = _masked_pixel_extractor()
    norm = (IMAGENET_MEAN, IMAGENET_STD)
    kw = dict(scales=scales, bucket=32, batch_size=2, device_scales=True,
              input_norm=norm)
    with tempfile.TemporaryDirectory() as td:
        paths = _write_jpegs(td, imgs)
        rgb_loader = ImageFromList(paths, imsize=128, raw_uint8=True)
        dct_loader = ImageFromList(paths, imsize=128, raw_uint8=True,
                                   dct_coeffs=8)
        # the DCT loader actually yields coefficient payloads
        assert isinstance(dct_loader[0], JpegCoeffs)
        ref = extract_vectors(extract, rgb_loader, **kw)
        got = extract_vectors(extract, dct_loader, dct_decode=True, **kw)
    assert ref.shape == got.shape
    cos = np.sum(ref * got, axis=1)
    assert cos.min() > 0.997, cos


def test_dct_pipeline_mixed_fallback_items():
    """bbox'd queries and non-JPEG files fall back to RGB arrays inside
    the SAME stream."""
    import cv2

    from research_image_retrieval_tpu.data import ImageFromList
    from research_image_retrieval_tpu.data.transforms import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )
    from research_image_retrieval_tpu.index import extract_vectors

    imgs = [_structured_image(120, 152, seed=20),
            _structured_image(120, 152, seed=21),
            _structured_image(96, 128, seed=22)]
    extract = _masked_pixel_extractor()
    norm = (IMAGENET_MEAN, IMAGENET_STD)
    kw = dict(scales=(1.0, 0.5), bucket=32, batch_size=2,
              device_scales=True, input_norm=norm)
    with tempfile.TemporaryDirectory() as td:
        paths = _write_jpegs(td, imgs[:2])
        png = os.path.join(td, "c.png")
        cv2.imwrite(png, cv2.cvtColor(imgs[2], cv2.COLOR_RGB2BGR))
        paths.append(png)
        bbxs = [None, (10, 8, 100, 90), None]
        rgb_loader = ImageFromList(paths, imsize=96, bbxs=bbxs,
                                   raw_uint8=True)
        dct_loader = ImageFromList(paths, imsize=96, bbxs=bbxs,
                                   raw_uint8=True, dct_coeffs=8)
        # items 1 (bbox) and 2 (png) fall back to arrays
        assert isinstance(dct_loader[0], JpegCoeffs)
        assert isinstance(dct_loader[1], np.ndarray)
        assert isinstance(dct_loader[2], np.ndarray)
        ref = extract_vectors(extract, rgb_loader, **kw)
        got = extract_vectors(extract, dct_loader, dct_decode=True, **kw)
    cos = np.sum(ref * got, axis=1)
    # fallback rows are bit-identical paths; the JPEG row is decode-parity
    assert cos.min() > 0.997, cos


def test_dct_pipeline_prescale_oversized_source():
    """A source much larger than imsize ships DOWNSCALED coefficients
    (out_block < 8) — the on-device analogue of libjpeg scale_denom."""
    from research_image_retrieval_tpu.data import ImageFromList
    from research_image_retrieval_tpu.data.transforms import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )
    from research_image_retrieval_tpu.index import extract_vectors

    imgs = [_structured_image(400, 520, seed=30)]
    extract = _masked_pixel_extractor()
    norm = (IMAGENET_MEAN, IMAGENET_STD)
    kw = dict(scales=(1.0, 0.5), bucket=32, batch_size=1,
              device_scales=True, input_norm=norm)
    with tempfile.TemporaryDirectory() as td:
        paths = _write_jpegs(td, imgs)
        dct_loader = ImageFromList(paths, imsize=128, raw_uint8=True,
                                   dct_coeffs=8)
        item = dct_loader[0]
        assert isinstance(item, JpegCoeffs)
        assert item.out_block == 2  # 520 * 2/8 = 130 >= 128 still holds
        assert item.target_hw == (98, 128)
        rgb_loader = ImageFromList(paths, imsize=128, raw_uint8=True)
        ref = extract_vectors(extract, rgb_loader, **kw)
        got = extract_vectors(extract, dct_loader, dct_decode=True, **kw)
    cos = np.sum(ref * got, axis=1)
    # prescale resampling differs from the host lanczos thumbnail, so
    # parity is looser here (descriptor-level, not pixel-level)
    assert cos.min() > 0.99, cos
