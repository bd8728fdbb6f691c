"""Native JPEG decoder parity and behavior tests."""

import numpy as np
import pytest

from research_image_retrieval_tpu.data.native_decode import (
    decode_jpeg,
    decode_jpeg_batch,
    native_available,
)


def _jpeg_bytes(rng, h=96, w=128, quality=95):
    import cv2

    img = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
    ok, buf = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, quality])
    assert ok
    return bytes(buf), img


class TestNativeDecode:
    def test_native_builds(self):
        assert native_available(), "native decoder failed to build"

    def test_matches_cv2(self, rng):
        import cv2

        data, _ = _jpeg_bytes(rng)
        ours = decode_jpeg(data)
        theirs = cv2.cvtColor(
            cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR),
            cv2.COLOR_BGR2RGB,
        )
        assert ours.shape == theirs.shape
        # libjpeg IDCT variants differ by a few counts per pixel
        assert np.mean(np.abs(ours.astype(int) - theirs.astype(int))) < 3.0

    def test_dct_prescale(self, rng):
        data, _ = _jpeg_bytes(rng, h=256, w=512)
        out = decode_jpeg(data, max_side=128)
        # largest 1/2^k scale with max side >= 128: 512/4 = 128
        assert max(out.shape[:2]) == 128
        assert out.shape[:2] == (64, 128)

    def test_prescale_never_below_target(self, rng):
        data, _ = _jpeg_bytes(rng, h=200, w=300)
        out = decode_jpeg(data, max_side=128)
        assert max(out.shape[:2]) >= 128

    def test_batch_parallel(self, rng):
        datas = [
            _jpeg_bytes(rng, h=64 + 8 * i, w=96)[0] for i in range(12)
        ]
        outs = decode_jpeg_batch(datas, num_threads=4)
        assert len(outs) == 12
        for i, o in enumerate(outs):
            assert o.shape == (64 + 8 * i, 96, 3)
            single = decode_jpeg(datas[i])
            np.testing.assert_array_equal(o, single)

    def test_corrupt_input_falls_back_or_errors_gracefully(self):
        with pytest.raises(Exception):
            decode_jpeg(b"not a jpeg at all")
