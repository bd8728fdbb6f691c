"""Normalization ops with torch-compatible semantics.

The descriptor contract of every model in the zoo is "L2-normalized at the
output" (reference: e.g. networks/RetrievalNet.py:277,343), so the exact
normalization semantics are part of the fidelity gate.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["l2_normalize"]


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2 normalization matching ``torch.nn.functional.normalize``.

    torch semantics: ``x / max(||x||_2, eps)`` — the norm (not the input) is
    clamped, so zero vectors map to zero rather than NaN.
    """
    norm = jnp.linalg.norm(x, ord=2, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)
