"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8), the TPU answer to
"test distributed code without a cluster".

This environment eagerly registers a TPU platform plugin at interpreter
start (sitecustomize), so plain JAX_PLATFORMS env manipulation is not
enough — we must override via jax.config before any backend is touched.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng(request):
    # per-test deterministic stream, independent of test ORDER — a shared
    # session rng made luck-calibrated assertions fail whenever a new test
    # file shifted the draw sequence of everything after it alphabetically
    import zlib

    return np.random.default_rng(zlib.crc32(request.node.nodeid.encode()))
