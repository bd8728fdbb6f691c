"""Fused bottleneck Pallas kernel: numerics vs the unfused composition.

The kernel is a measured HONEST NEGATIVE for throughput (see
ops/resblock_pallas.py docstring + BENCH.md) but stays correct and
tested: interpret-mode on the CPU mesh, checked against the XLA
composition at awkward heights (odd rows, height == tile, height < tile)
to exercise the halo-row masking.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from research_image_retrieval_tpu.ops.resblock_pallas import (
    fold_bn,
    fused_bottleneck_reference,
    pallas_fused_bottleneck,
)


def _make(rng, bhwc, cw):
    b, h, w, c = bhwc
    x = jnp.asarray(rng.standard_normal((b, h, w, c)) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, cw)) * c ** -0.5, jnp.float32)
    w2 = jnp.asarray(
        rng.standard_normal((3, 3, cw, cw)) * (9 * cw) ** -0.5, jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((cw, c)) * cw ** -0.5, jnp.float32)

    def sb(n):
        return fold_bn(
            jnp.asarray(rng.uniform(0.5, 1.5, n), jnp.float32),
            jnp.asarray(rng.uniform(-0.2, 0.2, n), jnp.float32),
            jnp.asarray(rng.uniform(-0.1, 0.1, n), jnp.float32),
            jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32),
        )

    return x, (w1, sb(cw), w2, sb(cw), w3, sb(c))


@pytest.mark.parametrize("height", [19, 16, 7])
def test_matches_reference(rng, height):
    x, ws = _make(rng, (2, height, 32, 64), 16)
    ref = fused_bottleneck_reference(x, *ws)
    got = pallas_fused_bottleneck(x, *ws, th=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fold_bn_matches_batchnorm_inference(rng):
    c = 24
    scale = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
    bias = jnp.asarray(rng.uniform(-0.5, 0.5, c), jnp.float32)
    mean = jnp.asarray(rng.standard_normal(c), jnp.float32)
    var = jnp.asarray(rng.uniform(0.2, 2.0, c), jnp.float32)
    x = jnp.asarray(rng.standard_normal((5, c)), jnp.float32)
    sb = fold_bn(scale, bias, mean, var, eps=1e-5)
    want = (x - mean) / jnp.sqrt(var + 1e-5) * scale + bias
    np.testing.assert_allclose(
        np.asarray(x * sb[0] + sb[1]), np.asarray(want), rtol=1e-6, atol=1e-6)
