"""Honest device timing under asynchronous/remote execution.

On this TPU rig ``block_until_ready`` acks asynchronously through the
remote-execution tunnel (a 1.1-TFLOP matmul "times" at 0.05 ms), and a
host readback adds seconds of constant tunnel latency.  Neither gives a
usable per-step time directly.  ``timed_slope`` fixes both problems:

* steps are CHAINED — each iteration's input depends on the previous
  output (a tiny, non-foldable perturbation), so the device cannot
  overlap or elide them;
* the run ends with a single small host readback, forcing completion;
* per-step time is the SLOPE between two chain lengths, cancelling the
  constant readback/tunnel overhead.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import numpy as np

__all__ = ["timed_slope", "chain_perturb"]


def chain_perturb(x, out):
    """Perturb ``x`` by a value-dependent epsilon of ``out`` (forces a data
    dependency that XLA cannot constant-fold or DCE)."""
    import jax.numpy as jnp

    leaf = jax.tree.leaves(out)[0]
    eps = jnp.asarray(leaf).ravel()[0].astype(jnp.float32) * 1e-12
    return jax.tree.map(lambda a: a + eps.astype(a.dtype), x)


def _run_chain(step: Callable, x0, n: int) -> float:
    x = x0
    out = None
    t0 = time.perf_counter()
    for _ in range(n):
        out = step(x)
        x = chain_perturb(x, out)
    # single forced completion via tiny readback
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return time.perf_counter() - t0


def timed_slope(step: Callable, x0, n_small: int = 3, n_large: int = 13) -> float:
    """Per-step seconds of ``step`` via two chained runs.

    ``step(x) -> out`` must accept its (possibly perturbed) input again.
    Warm up separately before calling (compile excluded by the slope
    anyway, but warmup keeps both runs on the cached executable).
    """
    _run_chain(step, x0, 1)  # warmup / compile
    t_small = _run_chain(step, x0, n_small)
    t_large = _run_chain(step, x0, n_large)
    return max(t_large - t_small, 1e-9) / (n_large - n_small)
