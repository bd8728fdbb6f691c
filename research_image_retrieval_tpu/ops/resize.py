"""In-graph per-image bilinear resize weights.

``dense_resize_weights`` builds the [B, out_pad, in_pad] separable
triangle-kernel (bilinear, half-pixel centers) weight matrices of
``jax.image.resize(method="bilinear")`` from per-image int32 extents —
entirely on device, so a batched variable-extent resize is two MXU
einsums with no host-built tap tables.  Weights are masked to each
image's valid input extent (padding never bleeds in) and normalized per
output sample; output rows beyond the image's output extent carry zero
weight.  Consumed by the streaming extractor (index/extract.py) and by
models whose architecture resizes feature maps per-image under masked
bucketed extraction (e.g. AdaptiveHybrid's Scale-GeM half-scale branch,
reference adaptive_hybrid_retrieval_complete.py:262-270).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["dense_resize_weights"]


def dense_resize_weights(in_sz, out_sz, in_pad: int, out_pad: int,
                         antialias: bool = True):
    """[B, out_pad, in_pad] resize weights from per-image extents.

    Args:
      in_sz / out_sz: [B] int32 valid input / output extents.
      in_pad / out_pad: static padded sizes (>= every extent).
      antialias: widen the triangle kernel when downscaling
        (jax.image.resize semantics); False reproduces torch
        ``F.interpolate(mode="bilinear")``'s plain 2-tap kernel.
    """
    f32 = jnp.float32
    o = jnp.arange(out_pad, dtype=f32)[None, :]               # [1, op]
    h = jnp.arange(in_pad, dtype=f32)[None, None, :]          # [1, 1, ip]
    in_f = in_sz.astype(f32)[:, None]                         # [B, 1]
    out_f = out_sz.astype(f32)[:, None]
    inv = in_f / jnp.maximum(out_f, 1.0)
    ks = jnp.maximum(inv, 1.0) if antialias else jnp.ones_like(inv)
    sample = (o + 0.5) * inv - 0.5                            # [B, op]
    x = jnp.abs(sample[:, :, None] - h) / ks[:, :, None]
    w = jnp.maximum(0.0, 1.0 - x)                             # triangle
    w = jnp.where(h < in_f[:, :, None], w, 0.0)
    w = jnp.where((o < out_f)[:, :, None], w, 0.0)
    tot = w.sum(axis=2, keepdims=True)
    return jnp.where(jnp.abs(tot) > 1e-7, w / tot, 0.0)
