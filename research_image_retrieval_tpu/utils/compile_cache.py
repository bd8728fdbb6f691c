"""Persistent XLA compilation cache.

Bucketed variable-resolution extraction compiles one program per
(bucket, scale) pair; on a real aspect-varied dataset that is tens of
1024px graphs, each tens of seconds on a small host. The persistent
cache makes those compiles a one-time cost across processes/runs — the
second evaluation of a dataset starts hot.

Enabled by default from every CLI entry point; opt out with
RIR_NO_COMPILE_CACHE=1 or choose the location with RIR_COMPILE_CACHE.
"""

from __future__ import annotations

import os

__all__ = ["enable_persistent_cache"]


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` (default
    ``~/.cache/rir_xla``).  Returns the directory, or None when disabled
    or unsupported."""
    if os.environ.get("RIR_NO_COMPILE_CACHE"):
        return None
    path = path or os.environ.get(
        "RIR_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "rir_xla"),
    )
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took meaningful compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return path
    except Exception:
        return None  # older jax / read-only fs: run without the cache
