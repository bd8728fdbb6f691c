"""Image transforms with torchvision-compatible semantics (host-side numpy).

Behavioral contracts (reference: dataset/configdataset.py:415-445,
dataset/ImageFromList.py:15-27):

* train: RandomResizedCrop(imsize, scale=(0.2, 1.0)) + HFlip(0.5) +
  ColorJitter(0.4, 0.4, 0.2, 0.1) applied with p=0.8 + ImageNet normalize.
* val: Resize(imsize * 8/7, bicubic) + CenterCrop(imsize) + normalize.
* ``imthumbnail``: aspect-preserving resize so max side == imsize
  (the reference's Pillow ANTIALIAS call is broken on Pillow >= 10 —
  SURVEY.md known defects; LANCZOS here).
* optional RGB -> BGR channel flip for Caffe-pretrained backbones.

All randomness flows through an explicit per-item seed so the pipeline is
deterministic and resumable (no global RNG state).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "normalize",
    "rgb_to_bgr",
    "imthumbnail",
    "resize_bilinear",
    "center_crop",
    "random_resized_crop",
    "color_jitter",
    "TrainTransform",
    "EvalTransform",
]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _to_float(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    return img.astype(np.float32)


def normalize(img: np.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    return (_to_float(img) - mean) / std


def rgb_to_bgr(img: np.ndarray) -> np.ndarray:
    return img[..., ::-1]


def _cv2_resize(img: np.ndarray, h: int, w: int, interp: str = "bilinear"):
    import cv2

    flags = {
        "bilinear": cv2.INTER_LINEAR,
        "bicubic": cv2.INTER_CUBIC,
        "lanczos": cv2.INTER_LANCZOS4,
        "area": cv2.INTER_AREA,
    }[interp]
    return cv2.resize(img, (w, h), interpolation=flags)


def resize_bilinear(img: np.ndarray, h: int, w: int) -> np.ndarray:
    return _cv2_resize(img, h, w, "bilinear")


def imthumbnail(img: np.ndarray, imsize: int) -> np.ndarray:
    """Aspect-preserving resize so the max side equals ``imsize``."""
    h, w = img.shape[:2]
    if max(h, w) == imsize:
        return img
    s = imsize / max(h, w)
    return _cv2_resize(img, max(int(round(h * s)), 1), max(int(round(w * s)), 1),
                       "lanczos")


def center_crop(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    top = max((h - size) // 2, 0)
    left = max((w - size) // 2, 0)
    return img[top : top + size, left : left + size]


def random_resized_crop(
    img: np.ndarray,
    size: int,
    rng: np.random.Generator,
    scale=(0.2, 1.0),
    ratio=(3 / 4, 4 / 3),
    attempts: int = 10,
) -> np.ndarray:
    """torchvision RandomResizedCrop semantics (area-scale + log-ratio)."""
    h, w = img.shape[:2]
    area = h * w
    for _ in range(attempts):
        target_area = area * rng.uniform(*scale)
        log_ratio = np.log(ratio)
        aspect = np.exp(rng.uniform(*log_ratio))
        cw = int(round(np.sqrt(target_area * aspect)))
        ch = int(round(np.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            top = int(rng.integers(0, h - ch + 1))
            left = int(rng.integers(0, w - cw + 1))
            crop = img[top : top + ch, left : left + cw]
            return _cv2_resize(crop, size, size, "bilinear")
    # fallback: center crop of the largest valid region
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    crop = center_crop(img, min(ch, cw))
    return _cv2_resize(crop, size, size, "bilinear")


def _adjust_brightness(img, factor):
    return img * factor


def _adjust_contrast(img, factor):
    mean = img.mean(axis=(0, 1), keepdims=True).mean()
    return (img - mean) * factor + mean


def _adjust_saturation(img, factor):
    gray = img @ np.array([0.299, 0.587, 0.114], np.float32)
    gray = gray[..., None]
    return (img - gray) * factor + gray


def _adjust_hue(img, delta):
    import cv2

    hsv = cv2.cvtColor(np.clip(img, 0, 1), cv2.COLOR_RGB2HSV)
    hsv[..., 0] = (hsv[..., 0] + delta * 360.0) % 360.0
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)


def color_jitter(
    img: np.ndarray,
    rng: np.random.Generator,
    brightness: float = 0.4,
    contrast: float = 0.4,
    saturation: float = 0.2,
    hue: float = 0.1,
) -> np.ndarray:
    """torchvision ColorJitter: random order, uniform factors."""
    img = _to_float(img)
    ops = []
    if brightness:
        f = rng.uniform(max(0, 1 - brightness), 1 + brightness)
        ops.append(lambda x: _adjust_brightness(x, f))
    if contrast:
        f = rng.uniform(max(0, 1 - contrast), 1 + contrast)
        ops.append(lambda x: _adjust_contrast(x, f))
    if saturation:
        f = rng.uniform(max(0, 1 - saturation), 1 + saturation)
        ops.append(lambda x: _adjust_saturation(x, f))
    if hue:
        d = rng.uniform(-hue, hue)
        ops.append(lambda x: _adjust_hue(x, d))
    for i in rng.permutation(len(ops)):
        img = ops[i](img)
    return np.clip(img, 0.0, 1.0)


class TrainTransform:
    """Reference train augmentation stack (configdataset.py:417-424).

    Randomness is seeded by (seed, epoch, index): deterministic and
    resumable, but each epoch sees fresh augmentations.  The data pipeline
    calls ``set_epoch`` at epoch boundaries (DistributedSampler-style).

    ``raw_uint8=True`` yields RAW uint8 crops (no /255, no mean/std): the
    train step fuses ``(x/255 - mean)/std`` on-device (train/loop.py
    ``input_norm``), cutting host->device bytes 4x and skipping all host
    float math.  Crop/flip/jitter then run in uint8 space — which is
    what the REFERENCE does too (torchvision RandomResizedCrop +
    ColorJitter operate on uint8 PIL images before ToTensor,
    configdataset.py:417-424); the default float path quantizes nothing
    and differs from uint8 staging by < 1/255 per channel.
    """

    def __init__(self, imsize: int = 512, seed: int = 0, jitter_p: float = 0.8,
                 bgr: bool = False, raw_uint8: bool = False):
        if raw_uint8 and bgr:
            raise ValueError(
                "raw_uint8 stages normalization on-device with RGB stats; "
                "the BGR (Caffe) path needs host normalization"
            )
        self.imsize = imsize
        self.seed = seed
        self.jitter_p = jitter_p
        self.bgr = bgr
        self.raw_uint8 = raw_uint8
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = int(epoch)

    def __call__(self, img: np.ndarray, index: int = 0) -> np.ndarray:
        rng = np.random.default_rng((self.seed, self.epoch, index))
        if not self.raw_uint8:
            img = _to_float(img)
        elif img.dtype != np.uint8:  # float sources (e.g. synthetic data)
            img = (np.clip(_to_float(img), 0, 1) * 255.0 + 0.5).astype(
                np.uint8
            )
        img = random_resized_crop(img, self.imsize, rng)
        if rng.random() < 0.5:
            img = img[:, ::-1]
        if rng.random() < self.jitter_p:
            img = color_jitter(img, rng)  # float 0-1 out
            if self.raw_uint8:
                img = (img * 255.0 + 0.5).astype(np.uint8)
        if self.raw_uint8:
            return np.ascontiguousarray(img)
        img = normalize(img)
        if self.bgr:
            img = rgb_to_bgr(img)
        return np.ascontiguousarray(img, np.float32)


class EvalTransform:
    """Reference val stack: resize(8/7 * imsize, bicubic) + center crop
    (configdataset.py:426-432).

    ``raw_uint8``: as in :class:`TrainTransform` — uint8 out, with
    ``(x/255 - mean)/std`` fused into the device step (the reference's
    PIL bicubic resize operates in uint8 too).
    """

    def __init__(self, imsize: int = 512, bgr: bool = False,
                 raw_uint8: bool = False):
        if raw_uint8 and bgr:
            raise ValueError(
                "raw_uint8 stages normalization on-device with RGB stats; "
                "the BGR (Caffe) path needs host normalization"
            )
        self.imsize = imsize
        self.bgr = bgr
        self.raw_uint8 = raw_uint8

    def __call__(self, img: np.ndarray, index: int = 0) -> np.ndarray:
        if self.raw_uint8:
            if img.dtype != np.uint8:
                img = (np.clip(_to_float(img), 0, 1) * 255.0 + 0.5).astype(
                    np.uint8
                )
        else:
            img = _to_float(img)
        target = int(self.imsize * 8 / 7)
        h, w = img.shape[:2]
        s = target / min(h, w)
        img = _cv2_resize(img, int(round(h * s)), int(round(w * s)), "bicubic")
        img = center_crop(img, self.imsize)
        if self.raw_uint8:
            return np.ascontiguousarray(img)
        # bicubic overshoots; PIL (the reference's resize, uint8) saturates.
        # Clamp so the float path matches the uint8/PIL semantics.
        img = np.clip(img, 0.0, 1.0)
        img = normalize(img)
        if self.bgr:
            img = rgb_to_bgr(img)
        return np.ascontiguousarray(img, np.float32)
