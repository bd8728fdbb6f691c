"""Multi-scale descriptor extraction over padded resolution buckets.

Behavioral contract of the reference extractor (utils/helpfunc.py:18-48):

* multi-scale: for each scale s, bilinearly resize the input (skip scales
  whose resized min side < 36 px), run the model's extract pass, SUM the
  descriptors, divide by the number of kept scales, then L2-normalize.
* single-scale: images with min side < 36 px are upscaled so the min side
  is >= 64 px before extraction.

TPU-first redesign: the reference runs a batch-1 variable-resolution
Python loop (the #1 anti-pattern for XLA — one compile per distinct
shape).  Here every image is padded bottom/right into a QUANTIZED
resolution bucket (H, W rounded up to a multiple of ``bucket``) and runs
batched with a [B, 2] valid-extent array; the masked model paths (see
models/backbone.py) make the padding numerically invisible, so aspect-
preserving datasets like ROxford/RParis compile O(buckets) programs
instead of O(images).  Batch shapes are fixed by padding the tail chunk,
so each bucket compiles exactly once.

Multi-scale resizes happen on the host as two small matmuls per image
(precomputed triangle-kernel weight matrices identical to
``jax.image.resize(method="bilinear")``), feeding the same single-scale
bucketed device program — no per-(shape, scale) device compiles.
"""

from __future__ import annotations

import math
from typing import Callable, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from research_image_retrieval_tpu.ops import l2_normalize

__all__ = [
    "multiscale_descriptor",
    "extract_vectors",
    "resize_bilinear_np",
]

_MIN_SIDE = 36
_UPSCALE_TARGET = 64


def _snap(v: int, multiple: int) -> int:
    """Nearest positive multiple of ``multiple`` to ``v``."""
    return max(multiple, int(round(v / multiple)) * multiple)


def _resize_bilinear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear resize of NHWC batch (half-pixel centers = torch
    align_corners=False)."""
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method="bilinear")


def _resize_weights(in_size: int, out_size: int) -> np.ndarray:
    """[in, out] triangle-kernel weight matrix of jax.image.resize
    (method="bilinear", antialias=True, half-pixel centers)."""
    scale = out_size / in_size
    inv_scale = 1.0 / scale
    kernel_scale = max(inv_scale, 1.0)  # antialias widens when downscaling
    sample_f = (np.arange(out_size) + 0.5) * inv_scale - 0.5
    x = np.abs(sample_f[None, :] - np.arange(in_size)[:, None]) / kernel_scale
    weights = np.maximum(0.0, 1.0 - x)  # triangle kernel
    total = weights.sum(axis=0, keepdims=True)
    return np.where(np.abs(total) > 1e-7, weights / total, 0.0).astype(
        np.float32
    )


def resize_bilinear_np(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Host-side bilinear (antialiased) resize of one [H, W, C] image.

    Matches ``jax.image.resize(..., method="bilinear")`` to float rounding
    (tests/test_extract.py) — used so host-bucketed multi-scale extraction
    agrees with the on-device resize of ``multiscale_descriptor``.
    """
    img = np.asarray(img, np.float32)
    wh = _resize_weights(img.shape[0], h)  # [H_in, h]
    ww = _resize_weights(img.shape[1], w)  # [W_in, w]
    out = np.einsum("io,ijc->ojc", wh, img, optimize=True)
    return np.einsum("jo,ijc->ioc", ww, out, optimize=True)


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


def _scale_tasks(
    idx: int, img: np.ndarray, scales: Sequence[float], multiple: int = 1
) -> list[tuple[int, np.ndarray]]:
    """Expand one image into (owner index, scaled image) tasks, applying
    the reference's <36px guards (utils/helpfunc.py:22-46).

    ``multiple`` > 1 snaps every task's extents to the nearest multiple
    (one resize straight from the original — no double resampling): the
    grid-aligned-extent contract of patch/window models (ViT, CLIP-ViT,
    ULTRON), whose masked paths compute their token grid as
    ``valid_hw // patch`` and would silently drop boundary content on
    unaligned extents.
    """
    H, W = img.shape[:2]
    if len(scales) == 1 and scales[0] == 1.0:
        nh, nw = H, W
        if H < _MIN_SIDE or W < _MIN_SIDE:
            s = max(_UPSCALE_TARGET / H, _UPSCALE_TARGET / W)
            nh, nw = int(round(H * s)), int(round(W * s))
        if multiple > 1:
            nh, nw = _snap(nh, multiple), _snap(nw, multiple)
        if (nh, nw) != (H, W):
            img = resize_bilinear_np(img, nh, nw)
        return [(idx, img)]
    tasks = []
    for s in scales:
        nh, nw = int(math.floor(H * s)), int(math.floor(W * s))
        if nh < _MIN_SIDE or nw < _MIN_SIDE:
            continue
        if multiple > 1:
            nh, nw = _snap(nh, multiple), _snap(nw, multiple)
        scaled = (
            img if (nh, nw) == (H, W) else resize_bilinear_np(img, nh, nw)
        )
        tasks.append((idx, scaled))
    if not tasks:
        raise ValueError(
            f"All scales {scales} shrink a {H}x{W} image below {_MIN_SIDE}px"
        )
    return tasks


def _run_buckets_masked(
    extract_fn,
    tasks: list[tuple[int, np.ndarray]],
    bucket: int,
    batch_size: int,
    mesh=None,
) -> list[tuple[int, np.ndarray]]:
    """Run (owner, image) tasks through the bucketed masked extractor.

    Returns (owner, descriptor) pairs.  Each distinct (bucket shape) pair
    compiles once: the batch axis is fixed at ``batch_size`` (tail chunks
    are padded with zero images whose outputs are dropped).  With a
    ``mesh``, batches shard over its 'data' axis (ICI data-parallel index
    building) and the batch size rounds up to a multiple of that axis.
    """
    put = jnp.asarray
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        dsize = mesh.shape["data"]
        batch_size = -(-batch_size // dsize) * dsize
        in_sh = NamedSharding(mesh, PartitionSpec("data"))
        put = lambda x: jax.device_put(jnp.asarray(x), in_sh)
        jitted = jax.jit(
            extract_fn,
            out_shardings=NamedSharding(mesh, PartitionSpec()),
        )
    else:
        jitted = jax.jit(extract_fn)
    buckets: dict[tuple[int, int], list[tuple[int, np.ndarray]]] = {}
    q = lambda v: int(math.ceil(v / bucket) * bucket)
    for owner, img in tasks:
        key = (q(img.shape[0]), q(img.shape[1]))
        buckets.setdefault(key, []).append((owner, img))

    out: list[tuple[int, np.ndarray]] = []
    for (bh, bw), items in buckets.items():
        for start in range(0, len(items), batch_size):
            chunk = items[start : start + batch_size]
            n = len(chunk)
            batch = np.zeros((batch_size, bh, bw, 3), np.float32)
            extents = np.full((batch_size, 2), (bh, bw), np.int32)
            for k, (_, img) in enumerate(chunk):
                batch[k, : img.shape[0], : img.shape[1]] = img
                extents[k] = img.shape[:2]
            vecs = np.asarray(jitted(put(batch), put(extents)))
            out.extend((owner, vecs[k]) for k, (owner, _) in enumerate(chunk))
    return out


def extract_vectors(
    extract_fn: Callable[..., jnp.ndarray],
    images: Iterable[np.ndarray],
    scales: Sequence[float] = (1.0,),
    outputdim: int | None = None,
    print_freq: int = 0,
    bucket: int | None = 32,
    batch_size: int = 8,
    mesh=None,
    extent_multiple: int = 1,
) -> np.ndarray:
    """Extract descriptors for a sequence of variable-resolution images.

    Default (``bucket=32``): images are padded into quantized resolution
    buckets and the model is called as ``extract_fn(images, valid_hw)``
    with a [B, 2] valid-extent array — O(buckets) compiles regardless of
    how many distinct shapes the dataset has.  Multi-scale resizes run on
    the host (``resize_bilinear_np``); descriptors are summed per image,
    divided by the kept-scale count and re-L2-normalized, exactly the
    reference contract (utils/helpfunc.py:30-46).

    ``bucket=None`` falls back to exact-shape grouping with the device-side
    scale loop for models without masked extraction support (one compile
    per distinct (resolution, scale)).

    Args:
      extract_fn: [B,H,W,3] (+ optional valid_hw) -> [B,D] extract pass.
      images: iterable of [H,W,3] float arrays (may differ in H,W).
      scales: multi-scale factors.
      outputdim: optional expected descriptor dim (for empty input).
      bucket: resolution quantum in pixels, or None for exact shapes.
      batch_size: fixed device batch per bucket (tail chunks are padded).
      mesh: optional ``jax.sharding.Mesh`` — batches shard over its
        'data' axis for multi-chip index building (bucketed mode only).
      extent_multiple: grid alignment required by the model's masked
        path (patch size for ViT/CLIP-ViT, 32 for ULTRON; models
        advertise it as ``model.extent_multiple``).  Every task's extents
        are snapped to the nearest multiple before bucketing so
        ``valid_hw // patch`` inside the model is exact; the bucket
        quantum is rounded up to a multiple as well.  Bucketed mode only.

    Returns:
      [N, D] numpy array of descriptors in input order.
    """
    imgs = [np.asarray(img) for img in images]
    n = len(imgs)
    if n == 0:
        return np.zeros((0, outputdim or 0), dtype=np.float32)

    if bucket is None:
        return _extract_exact_shapes(
            extract_fn, imgs, scales, print_freq=print_freq
        )
    if extent_multiple > 1:
        bucket = -(-bucket // extent_multiple) * extent_multiple

    tasks: list[tuple[int, np.ndarray]] = []
    for i, img in enumerate(imgs):
        tasks.extend(_scale_tasks(i, img, scales, multiple=extent_multiple))

    results = _run_buckets_masked(extract_fn, tasks, bucket, batch_size,
                                  mesh=mesh)

    single = len(scales) == 1 and scales[0] == 1.0
    if single:
        out: list[np.ndarray | None] = [None] * n
        for owner, vec in results:
            out[owner] = vec
        return np.stack(out)  # type: ignore[arg-type]

    acc = np.zeros((n, results[0][1].shape[-1]), np.float32)
    kept = np.zeros((n,), np.int32)
    for owner, vec in results:
        acc[owner] += vec
        kept[owner] += 1
    acc /= np.maximum(kept, 1)[:, None]
    return np.asarray(l2_normalize(jnp.asarray(acc)))


def _extract_exact_shapes(
    extract_fn, imgs: list[np.ndarray], scales, print_freq: int = 0
) -> np.ndarray:
    """Exact-shape grouping (no masking): one compile per distinct
    (resolution, scale).  For models without masked extraction support."""
    jitted = jax.jit(extract_fn)
    buckets: dict[tuple[int, int], list[tuple[int, np.ndarray]]] = {}
    for i, img in enumerate(imgs):
        buckets.setdefault(img.shape[:2], []).append((i, img))

    n = len(imgs)
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
