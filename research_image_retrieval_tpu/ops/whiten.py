"""PCA whitening with shrinkage.

Learning runs on host (NumPy, fp64 eigendecomposition — done once per
index build); application is a fused subtract + matmul that XLA maps onto
the MXU, optionally truncated for dimensionality reduction.

Behavioral contract matches the reference learner
(networks/backbone.py:42-58) and its conv-based application
(networks/spca.py:205-227): ``y = P[:k] @ (x - m)``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["pca_whiten_learn", "apply_whitening"]


def pca_whiten_learn(X: np.ndarray, s: float = 1.0):
    """Learn PCA whitening with shrinkage ``s`` from descriptors ``X`` [N, D].

    Returns:
      m: [D] mean descriptor.
      P: [D, D] projection with rows sorted by decreasing eigenvalue;
         row i is scaled by ``eigval_i ** (-s/2)``.  Apply as
         ``(x - m) @ P[:k].T`` for a k-dim whitened output.

    ``s=1`` is full whitening; ``s<1`` shrinks the spectrum flattening
    (useful when N is small relative to D).
    """
    X = np.asarray(X, dtype=np.float64)
    n = X.shape[0]
    m = X.mean(axis=0)
    Xc = X - m
    cov = Xc.T @ Xc
    cov = (cov + cov.T) / (2.0 * n)
    eigval, eigvec = np.linalg.eigh(cov)  # ascending, real-symmetric
    order = np.argsort(eigval)[::-1]
    eigval = np.clip(eigval[order], 1e-14, None)
    eigvec = eigvec[:, order]
    P = (eigvec * eigval ** (-0.5 * s)).T  # rows = lambda^{-s/2} * v^T
    return m.astype(np.float32), P.astype(np.float32)


def apply_whitening(
    x: jnp.ndarray, m: jnp.ndarray, P: jnp.ndarray, out_dim: int | None = None
) -> jnp.ndarray:
    """Apply learned whitening: ``(x - m) @ P[:out_dim].T``.

    x: [..., D]; m: [D]; P: [D, D].  fp32 matmul (MXU) regardless of input.
    """
    Pk = P if out_dim is None else P[:out_dim]
    return jnp.matmul(
        (x - m).astype(jnp.float32),
        Pk.T.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
