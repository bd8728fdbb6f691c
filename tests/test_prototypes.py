"""Invariant tests for the research-prototype modules.

Mirrors the reference's only formal tests (spectrum_test.py's shape /
NaN / binary-mask / diagonal-self-causality assertions and the SPARSE
sparsity checks) — which cannot run against the reference because its
SPECTRUM file is truncated; here they run against the completed modules.
"""

import numpy as np

import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.models.spectrum import (
    BatchCASTLE,
    BatchNEXUS,
    HARMONY,
    PRISM,
)
from research_image_retrieval_tpu.models.sparse import (
    AdaptiveSparseEncoder,
    SemanticPreservingQuantization,
)

B, D = 8, 32


def _feats(rng):
    return jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))


class TestBatchCASTLE:
    def test_shapes_and_diag_self_causality(self, rng):
        mod = BatchCASTLE(D, num_heads=4)
        x = _feats(rng)
        variables = mod.init(jax.random.PRNGKey(0), x)
        out, mask = mod.apply(variables, x)
        assert out.shape == (B, D)
        assert np.all(np.isfinite(np.asarray(out)))
        # reference invariant: diagonal of the causal mask is 1
        assert bool(BatchCASTLE.causal_mask_diagonal_is_one(mask))
        # mask is binary
        m = np.asarray(mask)
        assert set(np.unique(m.astype(int))) <= {0, 1}


class TestPRISM:
    def test_mock_and_real_text(self, rng):
        mod = PRISM(D)
        x = _feats(rng)
        variables = mod.init(jax.random.PRNGKey(0), x, None)
        out = mod.apply(variables, x, None)
        assert out["fused"].shape == (B, D)
        text = jnp.asarray(rng.standard_normal((B, 3, 384)).astype(np.float32))
        out2 = mod.apply(variables, x, text)
        assert out2["fused"].shape == (B, D)
        assert not np.allclose(np.asarray(out["fused"]), np.asarray(out2["fused"]))


class TestBatchNEXUS:
    def test_sparse_window(self, rng):
        mod = BatchNEXUS(D, max_window=3)
        x = _feats(rng)
        variables = mod.init(jax.random.PRNGKey(0), x)
        out, keep = mod.apply(variables, x)
        assert out.shape == (B, D)
        k = np.asarray(keep)
        # every sample keeps at least itself and at most max_window peers
        assert np.all(k.sum(axis=1) >= 1)
        assert np.all(k.sum(axis=1) <= 3)
        assert np.all(np.diagonal(k))  # self always kept (rank 0)


class TestHARMONY:
    def test_gated_fusion(self, rng):
        mod = HARMONY(D)
        branches = [_feats(rng) for _ in range(4)]
        variables = mod.init(jax.random.PRNGKey(0), branches)
        out = mod.apply(variables, branches)
        assert out.shape == (B, D)
        assert np.all(np.isfinite(np.asarray(out)))


class TestSparseEncoder:
    def test_sparsity_in_range(self, rng):
        mod = AdaptiveSparseEncoder(D, min_sparsity=0.1, max_sparsity=0.3)
        x = _feats(rng)
        variables = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(variables, x)
        actual = np.asarray(out["actual_sparsity"])
        # kept fraction ~= sparsity (threshold is strict, so <= sparsity)
        assert np.all(actual <= 0.35)
        assert np.all(actual >= 0.0)
        m = np.asarray(out["mask"])
        np.testing.assert_array_equal(
            np.asarray(out["sparse_features"]), np.asarray(x) * m
        )

    def test_gradients(self, rng):
        mod = AdaptiveSparseEncoder(D)
        x = _feats(rng)
        variables = mod.init(jax.random.PRNGKey(0), x)
        g = jax.grad(
            lambda xx: mod.apply(variables, xx)["sparse_features"].sum()
        )(x)
        assert np.all(np.isfinite(np.asarray(g)))


class TestQuantization:
    def test_bits_range_and_ste(self, rng):
        mod = SemanticPreservingQuantization(D, min_bits=2, max_bits=8)
        x = jnp.abs(_feats(rng))
        variables = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(variables, x)
        bits = np.asarray(out["bits"])
        assert bits.min() >= 2 and bits.max() <= 8
        assert 2 <= float(out["avg_bits"]) <= 8
        # STE: gradient of quantized wrt input is identity-like (not zero)
        g = jax.grad(
            lambda xx: mod.apply(variables, xx)["quantized_features"].sum()
        )(x)
        assert float(jnp.abs(g).sum()) > 0
