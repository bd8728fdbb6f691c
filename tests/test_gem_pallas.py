"""Fused GeM+whiten+L2 kernel parity vs the unfused composition."""

import numpy as np

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from research_image_retrieval_tpu.ops.gem_pallas import (
    gem_whiten_l2_reference,
    pallas_gem_whiten_l2,
)


def _setup(rng, B=2, H=7, W=9, C=32, D=16):
    fmap = rng.standard_normal((B, H, W, C)).astype(np.float32)
    w = (rng.standard_normal((C, D)) * 0.1).astype(np.float32)
    b = (rng.standard_normal(D) * 0.01).astype(np.float32)
    return jnp.asarray(fmap), jnp.asarray(w), jnp.asarray(b)


def test_matches_reference(rng):
    fmap, w, b = _setup(rng)
    want = gem_whiten_l2_reference(fmap, w, b, p=3.0)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_gem_whiten_l2(fmap, w, b, p=3.0, block=16, weight_dtype='float32')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)


def test_hw_not_multiple_of_block(rng):
    fmap, w, b = _setup(rng, H=5, W=5)  # 25 tokens, block 16 -> padding
    want = gem_whiten_l2_reference(fmap, w, b)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_gem_whiten_l2(fmap, w, b, block=16, weight_dtype='float32')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)


def test_masked_bucket(rng):
    """Masked padded bucket must equal pooling the crop."""
    fmap, w, b = _setup(rng, B=1, H=8, W=8)
    crop = fmap[:, :5, :6, :]
    mask = np.zeros((1, 8, 8), np.float32)
    mask[:, :5, :6] = 1.0
    want = gem_whiten_l2_reference(crop, w, b)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_gem_whiten_l2(fmap, w, b, valid_hw=jnp.asarray(mask),
                                   block=16, weight_dtype='float32')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)


def test_unit_norm(rng):
    fmap, w, b = _setup(rng, B=3)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_gem_whiten_l2(fmap, w, b, block=32)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(got), axis=1), 1.0, rtol=1e-6
    )


def test_bf16_weight_tolerance(rng):
    """Default bf16 weights: descriptor within bf16 rounding of fp32."""
    fmap, w, b = _setup(rng)
    want = gem_whiten_l2_reference(fmap, w, b)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_gem_whiten_l2(fmap, w, b, block=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-3)
