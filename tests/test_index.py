"""Index-layer tests: query expansion and QAFF gallery serving."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.evaluation import compute_map
from research_image_retrieval_tpu.index import (
    HybridGallery,
    IterativeQueryExpansion,
    alpha_query_expansion,
    rank_full,
)
from research_image_retrieval_tpu.models import QAFF, get_model


def make_clusters(rng, n_classes=10, per_class=20, dim=32, noise=0.4):
    centers = rng.standard_normal((n_classes, dim))
    labels = np.repeat(np.arange(n_classes), per_class)
    X = centers[labels] + noise * rng.standard_normal((len(labels), dim))
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    return X.astype(np.float32), labels


class TestAlphaQE:
    def test_improves_map_on_clusters(self):
        # local deterministic rng: the session fixture's stream position
        # depends on suite composition, and this improvement margin is
        # data-sensitive (same fix as tests/test_token_ema.py)
        rng = np.random.default_rng(7)
        gallery, labels = make_clusters(rng, noise=0.8)
        q_idx = np.arange(0, len(labels), 20)
        queries = gallery[q_idx]
        gnd = [
            {"ok": np.setdiff1d(np.flatnonzero(labels == labels[q]), [q]),
             "junk": np.array([q])}
            for q in q_idx
        ]
        base_map, _ = compute_map(rank_full(queries, gallery), gnd)
        expanded = alpha_query_expansion(queries, gallery, k=10, alpha=3.0)
        qe_map, _ = compute_map(rank_full(np.asarray(expanded), gallery), gnd)
        assert qe_map > base_map, (base_map, qe_map)

    def test_unit_norm_output(self, rng):
        g, _ = make_clusters(rng)
        out = alpha_query_expansion(g[:5], g, k=5)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=1), 1.0, rtol=1e-5
        )


class TestIQE:
    def test_shapes_and_blend(self, rng):
        db = jnp.asarray(rng.standard_normal((50, 16)).astype(np.float32))
        q = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
        mod = IterativeQueryExpansion(embed_dim=16, top_k=5, max_iterations=2)
        variables = mod.init(jax.random.PRNGKey(0), q, db)
        out = mod.apply(variables, q, db)
        assert out["expanded_query"].shape == (4, 16)
        assert out["initial_scores"].shape == (4, 50)
        assert out["final_scores"].shape == (4, 50)
        assert np.all(np.isfinite(np.asarray(out["final_scores"])))


class TestHybridGallery:
    @pytest.fixture(scope="class")
    def setup(self):
        model = get_model(
            "adaptive_hybrid_r50", backbone_name="resnet18", outputdim=32,
            num_classes=4,
        )
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(
            jax.random.PRNGKey(0), x, labels=jnp.zeros((1,), jnp.int32),
            train=False,
        )
        qaff = QAFF(feature_dim=32)
        qv = qaff.init(
            jax.random.PRNGKey(1), jnp.zeros((2, 32)),
            [jnp.zeros((2, 32))] * 3,
        )
        return model, variables, qaff, qv

    def test_add_and_search_roundtrip(self, setup, rng):
        model, variables, qaff, qv = setup
        gal = HybridGallery(model, variables, qaff, qv, batch_size=4)
        imgs = rng.standard_normal((10, 64, 64, 3)).astype(np.float32)
        gal.add(imgs, labels=np.arange(10), paths=[f"img{i}" for i in range(10)])
        assert len(gal) == 10

        scores, idx, paths = gal.search(imgs[3], top_k=5)
        assert scores.shape == (1, 5) and idx.shape == (1, 5)
        assert paths[0][0] == f"img{idx[0, 0]}"
        # incremental add keeps working
        gal.add(imgs[:2], labels=np.array([10, 11]), paths=["a", "b"])
        assert len(gal) == 12

    def test_empty_gallery_raises(self, setup):
        model, variables, qaff, qv = setup
        gal = HybridGallery(model, variables, qaff, qv)
        with pytest.raises(ValueError, match="empty"):
            gal.search(np.zeros((64, 64, 3), np.float32))
