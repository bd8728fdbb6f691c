"""Evaluation image loader: path lists with query bbox crops.

Behavioral contract of the reference loader
(reference: dataset/ImageFromList.py:30-60): loads each path, optionally
crops the query bounding box, thumbnails so the max side == imsize, and
yields variable-resolution single images.  The TPU extraction stack
(index.extract) buckets these by resolution, so this loader stays simple.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from research_image_retrieval_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    imthumbnail,
    normalize,
    rgb_to_bgr,
)

__all__ = ["ImageFromList", "PrefetchedImages", "load_image"]


def load_image(path: str, max_side: int = 0) -> np.ndarray:
    """Load an image file as RGB uint8 HWC.

    ``max_side`` > 0 enables DCT-domain prescaling for JPEGs through the
    native decoder (native/rir_decoder.cc): libjpeg emits the smallest
    1/2^k scaling whose max side is still >= ``max_side``, skipping most
    of the IDCT + color-convert work for sources much larger than the
    thumbnail target.  The caller still owns the exact final resize.
    """
    if max_side > 0 and path.lower().endswith((".jpg", ".jpeg")):
        from research_image_retrieval_tpu.data.native_decode import (
            decode_jpeg,
            native_available,
        )

        if native_available():
            with open(path, "rb") as f:
                return decode_jpeg(f.read(), max_side=max_side)
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class ImageFromList:
    """Dataset over a list of image paths (eval-time extraction input).

    Args:
      paths: image file paths.
      imsize: max-side thumbnail target (None keeps native resolution).
      bbxs: optional per-image (x1, y1, x2, y2) crop boxes (query crops).
      normalize_input: apply ImageNet normalization.
      bgr: RGB -> BGR for Caffe-pretrained backbones.
      raw_uint8: yield RAW uint8 after crop/thumbnail (no /255, no
        normalization) — for ``extract_vectors(input_norm=...)``, which
        normalizes inside the device programs and transfers 4x fewer
        host->device bytes.  Mutually exclusive with ``bgr`` (the fused
        stage uses RGB ImageNet stats).
      fast_decode: decode JPEGs with native DCT-domain prescaling to the
        smallest 1/2^k scale still >= ``imsize`` before the exact
        thumbnail resize.  Skips most decode work for sources much
        larger than ``imsize`` (e.g. GLDv2 index building).  Images with
        a bbox still decode at full resolution (crop coordinates are in
        original pixels).  NOT the reference decode path — prescaled
        pixels differ from a full decode at the interpolation level, so
        leave off for strict-parity runs.
      dct_coeffs: > 0 switches JPEG items to the SPLIT decode: the host
        entropy-decodes only, yielding ``JpegCoeffs`` payloads (top-left
        k x k quantized DCT coefficients per 8x8 block) for
        ``extract_vectors(dct_decode=True)``, which finishes the decode
        on device — (k*k/64)*3 of the RGB-uint8 wire bytes (4x fewer at
        k=4).  Oversized sources prescale in the DCT domain
        (``out_block`` < 8) exactly like libjpeg's scale_denom.  Items
        with a bbox, non-JPEG files and unsupported chroma layouts fall
        back to RAW uint8 arrays (the stream handles both).  Requires
        ``raw_uint8`` semantics (device-side normalization).
    """

    def __init__(
        self,
        paths: Sequence[str],
        imsize: int | None = None,
        bbxs: Sequence | None = None,
        normalize_input: bool = True,
        bgr: bool = False,
        raw_uint8: bool = False,
        fast_decode: bool = False,
        dct_coeffs: int = 0,
    ):
        if raw_uint8 and bgr:
            raise ValueError(
                "raw_uint8 stages normalization on-device with RGB stats; "
                "the BGR (Caffe) path needs host normalization"
            )
        if dct_coeffs and not raw_uint8:
            raise ValueError("dct_coeffs requires raw_uint8=True "
                             "(device-side normalization)")
        self.paths = list(paths)
        self.imsize = imsize
        self.bbxs = list(bbxs) if bbxs is not None else None
        self.normalize_input = normalize_input
        self.bgr = bgr
        self.raw_uint8 = raw_uint8
        self.fast_decode = fast_decode
        self.dct_coeffs = int(dct_coeffs)

    def __len__(self):
        return len(self.paths)

    def _coeffs_item(self, i: int):
        """Split-decode path: JpegCoeffs payload, or None to fall back."""
        path = self.paths[i]
        if not path.lower().endswith((".jpg", ".jpeg")):
            return None
        if self.bbxs is not None and self.bbxs[i] is not None:
            return None  # crop coordinates live in pixel space
        from research_image_retrieval_tpu.data.native_decode import (
            decode_jpeg_coeffs,
        )

        with open(path, "rb") as f:
            co = decode_jpeg_coeffs(f.read(), k=self.dct_coeffs)
        if co is None:
            return None
        if self.imsize:
            # DCT-domain prescale (libjpeg scale_denom semantics): the
            # smallest 1/2^p whose max side is still >= imsize
            full = max(co.h, co.w)
            n = 8
            while n > 1 and full * (n // 2) // 8 >= self.imsize:
                n //= 2
            co.out_block = n
            dh, dw = co.decoded_hw
            if max(co.h, co.w) != self.imsize:
                s = self.imsize / max(co.h, co.w)
                co.target_hw = (max(int(round(co.h * s)), 1),
                                max(int(round(co.w * s)), 1))
            else:
                co.target_hw = (dh, dw)
        return co

    def __getitem__(self, i: int) -> np.ndarray:
        if self.dct_coeffs:
            co = self._coeffs_item(i)
            if co is not None:
                return co
        return self.rgb_item(i)

    def rgb_item(self, i: int) -> np.ndarray:
        """The decoded pixel item regardless of ``dct_coeffs`` — the
        rerank paths re-load shortlist images as pixels."""
        has_bbx = self.bbxs is not None and self.bbxs[i] is not None
        prescale = (
            self.imsize if (self.fast_decode and self.imsize and not has_bbx)
            else 0
        )
        img = load_image(self.paths[i], max_side=prescale)
        if self.bbxs is not None and self.bbxs[i] is not None:
            x1, y1, x2, y2 = (int(round(v)) for v in self.bbxs[i])
            img = img[y1:y2, x1:x2]
        if self.imsize is not None:
            img = imthumbnail(img, self.imsize)
        if self.raw_uint8:  # bgr is rejected in __init__
            return np.ascontiguousarray(img, np.uint8)
        img = img.astype(np.float32) / 255.0 if img.dtype == np.uint8 else img
        if self.normalize_input:
            img = normalize(img, IMAGENET_MEAN, IMAGENET_STD)
        if self.bgr:
            img = rgb_to_bgr(img)
        return np.ascontiguousarray(img, np.float32)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


class PrefetchedImages:
    """Decode-ahead wrapper for any indexable image dataset.

    Iterating yields ``dataset[i]`` in order while a small thread pool
    decodes up to ``depth`` items AHEAD — so JPEG decode of image i+1..
    overlaps the device compute / transfer of earlier batches inside
    ``index.extract_vectors`` (the streaming extractor only ever
    *pulls*; this wrapper is where the overlap comes from).  Decode is
    GIL-free on both paths (native libjpeg via
    ``data.native_decode.decode_jpeg`` releases the GIL, as does cv2),
    so even the 1-core bench rig overlaps decode with the
    tunnel-transfer waits.  The reference decodes in torch DataLoader
    worker processes (dataset/configdataset.py:294-302); a thread pool
    over GIL-free decoders is the equivalent without pickling images
    across process pipes.
    """

    def __init__(self, dataset, depth: int = 8, workers: int = 2):
        self.dataset = dataset
        self.depth = max(1, int(depth))
        self.workers = max(1, int(workers))

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, i: int):
        # Random access (used by the rerank paths, which re-load shortlist
        # images by gallery id) delegates straight to the wrapped dataset;
        # only sequential iteration gets the decode-ahead pool.
        return self.dataset[i]

    def rgb_item(self, i: int):
        """Pixel item regardless of the dataset's payload mode."""
        fn = getattr(self.dataset, "rgb_item", None)
        return self.dataset[i] if fn is None else fn(i)

    def __iter__(self):
        from concurrent.futures import ThreadPoolExecutor

        n = len(self.dataset)
        if n == 0:
            return
        with ThreadPoolExecutor(max_workers=self.workers) as pool:
            pending = {
                i: pool.submit(self.dataset.__getitem__, i)
                for i in range(min(self.depth, n))
            }
            for i in range(n):
                nxt = i + self.depth
                if nxt < n:
                    pending[nxt] = pool.submit(self.dataset.__getitem__, nxt)
                yield pending.pop(i).result()
