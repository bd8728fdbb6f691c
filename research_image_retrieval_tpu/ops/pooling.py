"""Global pooling ops over feature maps (NHWC).

TPU-first design notes: GeM is a clamp + pow + masked mean + pow chain of
elementwise VPU ops and a reduction — XLA fuses the whole thing into the
producing conv's epilogue, so no hand-written kernel is needed on the
forward path.  The ``valid_hw`` mask argument exists because TPU extraction
batches variable-resolution images into padded resolution buckets (the
reference runs batch-1 variable shapes instead: utils/helpfunc.py:19-48);
the mask keeps the mean over real pixels only so bucketing is numerically
invisible.

Behavioral contract matches the reference pooling ops:
  gem:  avg_pool(clamp(x, eps)^p)^(1/p)        (networks/RetrievalNet.py:318-325)
  spoc: avg_pool(clamp(x, eps))                (networks/RetrievalNet.py:359-365)
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["gem_pool", "spoc_pool", "avg_pool_all", "max_pool_all"]


def _masked_spatial_mean(x: jnp.ndarray, valid_hw=None) -> jnp.ndarray:
    """Mean over H, W of an NHWC tensor, optionally restricted to a mask.

    valid_hw: optional [B, H, W] (or broadcastable) float/bool mask of real
    (non-padded) pixels.
    """
    if valid_hw is None:
        return jnp.mean(x, axis=(1, 2))
    mask = valid_hw.astype(x.dtype)[..., None]  # [B, H, W, 1]
    total = jnp.sum(x * mask, axis=(1, 2))
    count = jnp.maximum(jnp.sum(mask, axis=(1, 2)), 1.0)
    return total / count


def gem_pool(
    x: jnp.ndarray,
    p: float | jnp.ndarray = 3.0,
    eps: float = 1e-6,
    valid_hw: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Generalized-mean pooling: ``mean(clamp(x, eps)^p)^(1/p)`` over H, W.

    Args:
      x: [B, H, W, C] feature map.
      p: GeM power — a scalar or a learnable [1] / [C] array.
      eps: clamp floor for numerical stability of the fractional power.
      valid_hw: optional [B, H, W] validity mask for padded buckets.

    Returns:
      [B, C] pooled descriptor.  fp32 accumulation regardless of input dtype.
    """
    xp = jnp.clip(x.astype(jnp.float32), min=eps) ** p
    pooled = _masked_spatial_mean(xp, valid_hw)
    return pooled ** (1.0 / p)


def spoc_pool(
    x: jnp.ndarray, eps: float = 1e-6, valid_hw: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Sum-pooling of convolutions (SPoC): clamped spatial mean."""
    return _masked_spatial_mean(jnp.clip(x.astype(jnp.float32), min=eps), valid_hw)


def avg_pool_all(x: jnp.ndarray, valid_hw: jnp.ndarray | None = None) -> jnp.ndarray:
    """Plain global average pool over H, W (no clamp)."""
    return _masked_spatial_mean(x.astype(jnp.float32), valid_hw)


def max_pool_all(x: jnp.ndarray, valid_hw: jnp.ndarray | None = None) -> jnp.ndarray:
    """Global max pool over H, W; padded positions are -inf under the mask."""
    x = x.astype(jnp.float32)
    if valid_hw is not None:
        neg = jnp.finfo(x.dtype).min
        x = jnp.where(valid_hw.astype(bool)[..., None], x, neg)
    return jnp.max(x, axis=(1, 2))
