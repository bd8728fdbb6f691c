"""Deterministic procedural retrieval dataset (no downloads needed).

The TPU analogue of the reference's RigorousDataset
(reference: manus/8_6and7_training_and_eval/rigorous_training.py:31-134):
each class gets a distinctive color + pattern (circle / stripes /
checkerboard / gradient) signature, plus per-sample noise and jitter, so
retrieval metrics computed on it are meaningful — a real fixture for
end-to-end extract -> rank -> mAP tests and benchmarks on CPU/TPU.
"""

from __future__ import annotations

import numpy as np

__all__ = ["SyntheticRetrievalDataset", "make_synthetic_gnd"]

_PATTERNS = ("circle", "stripes", "checker", "gradient")


class SyntheticRetrievalDataset:
    """Procedurally generated class-distinctive images.

    Args:
      num_classes: number of distinct landmark-like classes.
      samples_per_class: images per class.
      image_size: square image side.
      noise: per-sample additive noise std (0 disables).
      seed: base seed — the dataset is fully deterministic given it.
      uint8: yield RAW uint8 pixels (rounded from the float render)
        instead of float32 [0,1] — opt-in so the train driver's
        raw-uint8 path (4x fewer H2D bytes, device-fused
        normalization) can be exercised end-to-end on synthetic data.
      signature_seed: seed for the per-CLASS signatures (color, pattern,
        phase).  Defaults to ``seed`` (a standalone dataset), but
        train/val/test splits of one task MUST share it while varying
        ``seed`` — otherwise class c *looks different* in each split and
        held-out evaluation is unlearnable by construction (the defect
        behind the 0.0 test accuracies recorded before round 5; the
        reference derives signatures from the class id alone,
        rigorous_training.py:60-99, so its splits always share them).

    Access: ``len(ds)``, ``ds[i] -> (image [H,W,3] float32 in [0,1],
    label int)``, ``ds.images()`` iterator, ``ds.labels`` array.
    """

    def __init__(
        self,
        num_classes: int = 20,
        samples_per_class: int = 10,
        image_size: int = 64,
        noise: float = 0.08,
        seed: int = 0,
        uint8: bool = False,
        signature_seed: int | None = None,
    ):
        self.uint8 = uint8
        self.num_classes = num_classes
        self.samples_per_class = samples_per_class
        self.image_size = image_size
        self.noise = noise
        self.seed = seed
        self.labels = np.repeat(np.arange(num_classes), samples_per_class)
        base = np.random.default_rng(
            seed if signature_seed is None else signature_seed)
        # per-class signature: color, pattern type, pattern phase
        self._colors = base.uniform(0.2, 1.0, size=(num_classes, 3))
        self._patterns = base.integers(0, len(_PATTERNS), size=num_classes)
        self._phases = base.uniform(0, 1, size=num_classes)

    def __len__(self) -> int:
        return self.num_classes * self.samples_per_class

    def _render(self, cls: int, rng: np.random.Generator) -> np.ndarray:
        S = self.image_size
        yy, xx = np.mgrid[0:S, 0:S] / S
        color = self._colors[cls]
        phase = self._phases[cls]
        pat = _PATTERNS[self._patterns[cls]]

        img = np.zeros((S, S, 3), np.float32)
        img += 0.15  # dark background
        # per-sample geometric jitter: shift + slight scale
        dx, dy = rng.uniform(-0.08, 0.08, 2)
        scale = rng.uniform(0.9, 1.1)

        if pat == "circle":
            r = 0.25 * scale * (0.5 + phase)
            mask = (yy - 0.5 - dy) ** 2 + (xx - 0.5 - dx) ** 2 < r**2
        elif pat == "stripes":
            freq = 4 + int(phase * 6)
            mask = (np.sin(2 * np.pi * freq * (xx + dx) * scale) > 0.0)
        elif pat == "checker":
            n = 4 + int(phase * 4)
            mask = ((np.floor((xx + dx) * n) + np.floor((yy + dy) * n)) % 2) == 0
        else:  # gradient
            g = np.clip((xx * (0.5 + phase) + yy * (1.0 - phase)) * scale + dx, 0, 1)
            img += g[..., None] * color * 0.7
            mask = g > 0.6
        img[mask] = color * (0.8 + 0.2 * phase)

        if self.noise:
            img += rng.normal(0, self.noise, img.shape).astype(np.float32)
        return np.clip(img, 0.0, 1.0).astype(np.float32)

    def __getitem__(self, i: int):
        cls = int(self.labels[i])
        rng = np.random.default_rng(self.seed * 100_003 + i)
        img = self._render(cls, rng)
        if self.uint8:
            img = np.round(img * 255.0).astype(np.uint8)
        return img, cls

    def images(self):
        for i in range(len(self)):
            yield self[i][0]

    def as_arrays(self):
        """All images stacked: ([N,H,W,3], [N] labels)."""
        imgs = np.stack([self[i][0] for i in range(len(self))])
        return imgs, self.labels.copy()


def make_synthetic_gnd(labels: np.ndarray, query_idx: np.ndarray):
    """Build Revisited-style gnd for label-based retrieval on a synthetic set.

    For each query (a gallery member), same-class images are positives —
    split into easy (first half) and hard (second half) to exercise the
    E/M/H protocol — and the query itself is junk (standard protocol).

    Returns:
      list of gnd dicts with 'easy'/'hard'/'junk' gallery-index arrays.
    """
    gnd = []
    for q in query_idx:
        members = np.flatnonzero(labels == labels[q])
        members = members[members != q]
        half = max(len(members) // 2, 1)
        gnd.append(
            {
                "easy": members[:half],
                "hard": members[half:],
                "junk": np.array([q]),
            }
        )
    return gnd
