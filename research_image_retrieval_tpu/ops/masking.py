"""Validity-mask helpers for bucketed variable-resolution extraction.

The reference extracts descriptors one image at a time at its exact
resolution (reference: utils/helpfunc.py:19-48, dataset/ImageFromList.py:40-57)
— a batch-1 variable-shape loop that forces one XLA compile per distinct
resolution.  The TPU-native redesign batches images into quantized
resolution buckets, padding each image bottom/right with zeros and carrying
its true extent as a ``[B, 2]`` int array of valid (height, width) pixels.

The helpers here translate those extents into spatial/token masks at any
feature resolution.  Masked model paths (see models/backbone.py) re-zero
the padded region before every spatial op so a padded image produces
bit-identical features to its exact-shape run: a conv's own zero padding at
the true image boundary and an explicitly zeroed pad region are the same
thing, so masking before each k>1 conv keeps every valid output cell exact.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "ceil_half",
    "downsample_extents",
    "hw_mask",
    "token_mask",
    "mask_attn_logits",
    "dynamic_resize_weights",
]

# Large finite negative for masked attention logits.  NOT -inf: rows whose
# keys are ALL padding (pad-query rows) would softmax to NaN and poison
# downstream masked sums (NaN * 0 == NaN); -1e30 keeps them finite garbage
# that the final pooling mask removes exactly.
_NEG = -1e30


def ceil_half(extents: jnp.ndarray) -> jnp.ndarray:
    """ceil(e / 2) elementwise for non-negative integer extents.

    Every downsampling step in a torch-padding ResNet (7x7/2 p3 stem,
    3x3/2 p1 maxpool, 1x1/2 and 3x3/2 p1 block convs) maps a spatial size
    h to ceil(h/2), so the valid-extent ladder is ceil-halving throughout.
    """
    return (extents + 1) // 2


def downsample_extents(extents: jnp.ndarray, times: int) -> jnp.ndarray:
    """Apply ``ceil_half`` ``times`` times."""
    for _ in range(times):
        extents = ceil_half(extents)
    return extents


def hw_mask(h: int, w: int, extents: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, h, w] mask of valid pixels given per-image extents.

    Args:
      h, w: static (padded/bucket) spatial dims.
      extents: [B, 2] int array of valid (height, width); padding is
        always bottom/right.
    """
    extents = jnp.asarray(extents)
    row = jnp.arange(h)[None, :] < extents[:, 0][:, None]  # [B, h]
    col = jnp.arange(w)[None, :] < extents[:, 1][:, None]  # [B, w]
    return (row[:, :, None] & col[:, None, :]).astype(dtype)


def token_mask(h: int, w: int, extents: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, h*w] mask over row-major flattened HW tokens."""
    return hw_mask(h, w, extents, dtype=dtype).reshape(-1, h * w)


def mask_attn_logits(logits: jnp.ndarray, key_mask: jnp.ndarray) -> jnp.ndarray:
    """Mask attention logits so padded keys receive zero attention.

    Args:
      logits: [..., Nk] pre-softmax scores.
      key_mask: [B, Nk] validity mask (1 = real token), broadcast across
        any middle axes (heads, queries).

    Returns:
      logits with padded-key positions set to a large finite negative.
    """
    m = key_mask.astype(bool)
    # broadcast [B, Nk] across logits' middle axes
    shape = (m.shape[0],) + (1,) * (logits.ndim - 2) + (m.shape[-1],)
    return jnp.where(m.reshape(shape), logits, _NEG)


def dynamic_resize_weights(n_out: int, n_in: int, true_out) -> jnp.ndarray:
    """Per-image bilinear resize weights [B, n_out, n_in].

    Reproduces ``jax.image.resize(method="bilinear", antialias=True)``
    from an (n_in)-sample source to each image's TRUE output length
    ``true_out`` (traced [B] ints), laid out in the first ``true_out``
    rows of the padded ``n_out`` grid (rows beyond it are zero).  Used
    for per-image positional-embedding interpolation in padded buckets
    (ULTRON, ViT).
    """
    t = jnp.asarray(true_out).astype(jnp.float32)[:, None, None]  # [B,1,1]
    scale = n_in / t  # inverse scale: out -> in
    kernel = jnp.maximum(scale, 1.0)  # antialias widens when downscaling
    i = jnp.arange(n_out, dtype=jnp.float32)[None, :, None]  # [1,n_out,1]
    p = jnp.arange(n_in, dtype=jnp.float32)[None, None, :]
    sample = (i + 0.5) * scale - 0.5
    w = jnp.maximum(0.0, 1.0 - jnp.abs(sample - p) / kernel)
    total = jnp.sum(w, axis=2, keepdims=True)
    w = jnp.where(jnp.abs(total) > 1e-7, w / jnp.maximum(total, 1e-7), 0.0)
    valid = (i < t).astype(w.dtype)
    return w * valid
