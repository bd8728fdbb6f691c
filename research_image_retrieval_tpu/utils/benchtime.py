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


def _make_chain(step: Callable, n: int):
    """One jitted program running ``n`` data-dependent step iterations.

    The whole chain executes device-side in a single dispatch, so host /
    tunnel starvation between steps (observed: a busy host inflated a
    5 ms step to 47 ms with Python-loop chaining) cannot pollute the
    measurement.  Extra ``args`` flow through as runtime jit arguments —
    never close over large arrays (they would be captured as multi-GB
    constants in the compiled program on this rig).
    """

    @jax.jit
    def chain(x, *args):
        def body(_, carry):
            out = step(carry, *args)
            return chain_perturb(carry, out)

        final = jax.lax.fori_loop(0, n, body, x)
        return step(final, *args)

    return chain


def _run_chain(chain, x0, args) -> float:
    t0 = time.perf_counter()
    out = chain(x0, *args)
    # single forced completion via tiny readback
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return time.perf_counter() - t0


def timed_slope(
    step: Callable, x0, n_small: int = 3, n_large: int = 13, args=()
) -> float:
    """Per-step seconds of ``step`` via the slope of two in-graph chains.

    ``step(x, *args) -> out`` must be traceable and accept its (perturbed)
    first input again; large constants (galleries, weights) go in ``args``.
    The constant compile/dispatch/readback overhead cancels in the slope;
    the chain itself is one XLA program per length.
    """
    small = _make_chain(step, n_small)
    large = _make_chain(step, n_large)
    _run_chain(small, x0, args)  # compile both before timing
    _run_chain(large, x0, args)
    t_small = _run_chain(small, x0, args)
    t_large = _run_chain(large, x0, args)
    sec = (t_large - t_small) / (n_large - n_small)
    if sec * n_large >= 0.2 * t_large:
        return sec
    # tunnel-noise guard: a slope far below the large chain's own wall
    # (incl. non-positive) means a latency spike landed on one endpoint
    # — re-measure once with medians of 3 before accepting it
    ts = sorted(_run_chain(small, x0, args) for _ in range(3))
    tl = sorted(_run_chain(large, x0, args) for _ in range(3))
    return max(tl[1] - ts[1], 1e-9) / (n_large - n_small)
