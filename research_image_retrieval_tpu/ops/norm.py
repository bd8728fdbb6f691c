"""Normalization ops with torch-compatible semantics.

The descriptor contract of every model in the zoo is "L2-normalized at the
output" (reference: e.g. networks/RetrievalNet.py:277,343), so the exact
normalization semantics are part of the fidelity gate.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["l2_normalize", "fused_input_norm"]


def fused_input_norm(input_norm):
    """The RAW-uint8 fused input stage, or identity for ``None``.

    ``input_norm=(mean, std)`` (0-1 scale) returns a function computing
    ``(x/255 - mean)/std`` — traced INSIDE jitted programs so uint8
    batches ship over host->device 4x smaller and the affine map fuses
    into the first conv's input.  This is THE single definition of the
    fused stage: the train/eval steps (train/loop.py), the extraction
    programs (index/extract.py) and the driver's init-trace probe all
    call it, so its semantics cannot drift apart.  Matches host numpy
    normalization of the same uint8 pixels to fp32 round-off (~1 ULP:
    XLA compiles the divisions as multiply-by-reciprocal).
    """
    if input_norm is None:
        return lambda images: images
    mean = jnp.asarray(np.asarray(input_norm[0], np.float32))
    std = jnp.asarray(np.asarray(input_norm[1], np.float32))
    return lambda images: (images.astype(jnp.float32) / 255.0 - mean) / std


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2 normalization matching ``torch.nn.functional.normalize``.

    torch semantics: ``x / max(||x||_2, eps)`` — the norm (not the input) is
    clamped, so zero vectors map to zero rather than NaN.
    """
    norm = jnp.linalg.norm(x, ord=2, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)
