"""Multi-scale descriptor extraction.

Behavioral contract of the reference extractor (utils/helpfunc.py:18-48):

* multi-scale: for each scale s, bilinearly resize the input (skip scales
  whose resized min side < 36 px), run the model's extract pass, SUM the
  descriptors, divide by the number of kept scales, then L2-normalize.
* single-scale: images with min side < 36 px are upscaled so the min side
  is >= 64 px before extraction.

TPU-first redesign: instead of the reference's batch-1 variable-resolution
Python loop (the #1 anti-pattern for XLA), extraction is jitted per
(bucket resolution x scale) pair: every distinct input shape compiles once
and is then reused for all images in that bucket.  The scale loop is
unrolled at trace time (scales are static), so the multi-scale sum is a
single fused XLA program per bucket.
"""

from __future__ import annotations

import math
from typing import Callable, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from research_image_retrieval_tpu.ops import l2_normalize

__all__ = ["multiscale_descriptor", "extract_vectors"]

_MIN_SIDE = 36
_UPSCALE_TARGET = 64


def _resize_bilinear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear resize of NHWC batch (half-pixel centers = torch
    align_corners=False)."""
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method="bilinear")


def multiscale_descriptor(
    extract_fn: Callable[[jnp.ndarray], jnp.ndarray],
    images: jnp.ndarray,
    scales: Sequence[float] = (1.0,),
) -> jnp.ndarray:
    """Multi-scale descriptor for a batch of same-resolution images.

    Args:
      extract_fn: model extract pass, [B,H,W,C] -> [B,D] L2-normalized.
      images: [B, H, W, 3] batch.
      scales: static scale factors (reference default ms=[1, 2^-1/2, 1/2]).

    Returns:
      [B, D] descriptors; multi-scale results are sum/len-kept then
      re-L2-normalized per the reference contract.
    """
    _, H, W, _ = images.shape
    if len(scales) == 1 and scales[0] == 1.0:
        if H < _MIN_SIDE or W < _MIN_SIDE:
            s = max(_UPSCALE_TARGET / H, _UPSCALE_TARGET / W)
            images = _resize_bilinear(
                images, int(round(H * s)), int(round(W * s))
            )
        return extract_fn(images)

    acc = None
    kept = 0
    for s in scales:
        nh, nw = int(math.floor(H * s)), int(math.floor(W * s))
        if nh < _MIN_SIDE or nw < _MIN_SIDE:
            continue
        scaled = images if s == 1.0 else _resize_bilinear(images, nh, nw)
        vec = extract_fn(scaled)
        acc = vec if acc is None else acc + vec
        kept += 1
    if acc is None:
        raise ValueError(
            f"All scales {scales} shrink a {H}x{W} image below {_MIN_SIDE}px"
        )
    return l2_normalize(acc / kept)


def extract_vectors(
    extract_fn: Callable[[jnp.ndarray], jnp.ndarray],
    images: Iterable[np.ndarray],
    scales: Sequence[float] = (1.0,),
    outputdim: int | None = None,
    print_freq: int = 0,
) -> np.ndarray:
    """Extract descriptors for a sequence of variable-resolution images.

    Images are grouped by exact resolution; each distinct (resolution,
    scale) pair compiles once (``extract_fn`` should be jittable — it is
    wrapped in ``jax.jit`` here), and all images sharing a resolution run
    as one batch.  Order of the output follows the input order.

    Args:
      extract_fn: [B,H,W,3] -> [B,D] model extract pass.
      images: iterable of [H,W,3] float arrays (may differ in H,W).
      scales: multi-scale factors.
      outputdim: optional expected descriptor dim (for empty input).

    Returns:
      [N, D] numpy array of descriptors.
    """
    jitted = jax.jit(extract_fn)
    buckets: dict[tuple[int, int], list[tuple[int, np.ndarray]]] = {}
    n = 0
    for i, img in enumerate(images):
        img = np.asarray(img)
        buckets.setdefault(img.shape[:2], []).append((i, img))
        n = i + 1

    if n == 0:
        return np.zeros((0, outputdim or 0), dtype=np.float32)

    out: list[np.ndarray | None] = [None] * n
    done = 0
    for (h, w), items in buckets.items():
        idxs = [i for i, _ in items]
        batch = jnp.asarray(np.stack([im for _, im in items]), jnp.float32)
        vecs = np.asarray(multiscale_descriptor(jitted, batch, scales))
        for k, i in enumerate(idxs):
            out[i] = vecs[k]
        done += len(items)
        if print_freq and (done % print_freq == 0 or done == n):
            print(f"\r>>>> {done}/{n} done...", end="")
    if print_freq:
        print("")
    return np.stack(out)  # type: ignore[arg-type]
