"""Profiling and debug utilities.

Upgrades over the reference's wall-clock-only instrumentation
(reference: utils/helpfunc.py:284-315 — per-iter time + max memory only):

* ``trace`` — context manager around jax.profiler trace capture (Perfetto
  dumps for extraction / search kernels).
* ``step_timer`` — per-step host timing with device sync.
* ``nan_check`` — checkify-based NaN/Inf guard behind a flag (the
  reference has no numerical debugging at all).
* ``deterministic_mode`` — forces deterministic XLA reductions for
  reproducible runs.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax

__all__ = ["trace", "step_timer", "nan_check", "deterministic_mode"]


@contextlib.contextmanager
def trace(log_dir: str, name: str = "trace"):
    """Capture a jax.profiler trace (view in Perfetto/TensorBoard)."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class step_timer:
    """Times a block including device completion of ``result``.

    Usage:
        with step_timer() as t:
            out = step(...)
            t.sync(out)
        print(t.ms)
    """

    def __enter__(self):
        self._t0 = time.perf_counter()
        self.ms = None
        return self

    def sync(self, result):
        jax.tree.map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
            result,
        )
        return result

    def __exit__(self, *exc):
        self.ms = (time.perf_counter() - self._t0) * 1000.0
        return False


def nan_check(fn, enabled: bool = True):
    """Wrap a jittable fn with checkify NaN/Inf checks.

    Returns a function with the same signature that raises on non-finite
    intermediates when ``enabled`` (zero overhead otherwise).
    """
    if not enabled:
        return fn
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapped(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapped


@contextlib.contextmanager
def deterministic_mode():
    """Force deterministic XLA ops for bit-reproducible runs."""
    prev = os.environ.get("XLA_FLAGS", "")
    flag = "--xla_gpu_deterministic_ops=true"
    os.environ["XLA_FLAGS"] = (prev + " " + flag).strip()
    old_prng = jax.config.read("jax_threefry_partitionable")
    jax.config.update("jax_threefry_partitionable", True)
    try:
        yield
    finally:
        os.environ["XLA_FLAGS"] = prev
        jax.config.update("jax_threefry_partitionable", old_prng)
