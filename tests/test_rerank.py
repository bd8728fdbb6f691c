"""Reranker tests: CVNet correlation verification + geometric RANSAC."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.index.rerank import (
    geometric_verification_score,
    make_cvnet_batch_scorer,
    mutual_nn_matches,
    rerank_shortlist,
    rerank_shortlist_batched,
)
from research_image_retrieval_tpu.models.cvnet import (
    CenterPivotConv4d,
    CVNetRerank,
)


class TestCenterPivotConv4d:
    def test_shapes_stride1(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 4, 4, 4, 4, 9)).astype(np.float32))
        mod = CenterPivotConv4d(16, kernel=3)
        variables = mod.init(jax.random.PRNGKey(0), x)
        y = mod.apply(variables, x)
        assert y.shape == (2, 4, 4, 4, 4, 16)

    def test_shapes_stride2(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 6, 6, 6, 6, 9)).astype(np.float32))
        mod = CenterPivotConv4d(8, kernel=5, query_stride=2, key_stride=2)
        variables = mod.init(jax.random.PRNGKey(0), x)
        y = mod.apply(variables, x)
        assert y.shape == (1, 3, 3, 3, 3, 8)


class TestCVNet:
    @pytest.fixture(scope="class")
    def model(self):
        m = CVNetRerank(backbone_name="resnet18", reduction_dim=32)
        x = jnp.zeros((1, 64, 64, 3))
        variables = m.init(jax.random.PRNGKey(0), x, x)
        return m, variables

    def test_pair_score_in_unit_interval(self, model, rng):
        m, variables = model
        q = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
        s = m.apply(variables, q, k)
        s = np.asarray(s)
        assert s.shape == (2,)
        assert np.all((s >= 0) & (s <= 1))

    def test_cached_featuremap_path_matches(self, model, rng):
        m, variables = model
        q = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
        direct = m.apply(variables, q, k)
        qf = m.apply(variables, q, method="extract_featuremap")
        kf = m.apply(variables, k, method="extract_featuremap")
        cached = m.apply(variables, qf, kf, method="score_from_featuremaps")
        np.testing.assert_allclose(np.asarray(direct), np.asarray(cached), rtol=1e-5)

    def test_global_descriptor(self, model, rng):
        m, variables = model
        q = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
        d = m.apply(variables, q, method="extract")
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(d), axis=1), 1.0, rtol=1e-5
        )


class TestGeometricVerification:
    def test_identical_images_high_inliers(self, rng):
        n, d = 50, 16
        desc = rng.standard_normal((n, d)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=1, keepdims=True)
        coords = rng.uniform(0, 14, (n, 2)).astype(np.float32)
        score = geometric_verification_score(desc, coords, desc, coords)
        assert score >= n * 0.9

    def test_translated_consistent_geometry(self, rng):
        n, d = 40, 16
        desc = rng.standard_normal((n, d)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=1, keepdims=True)
        coords = rng.uniform(0, 14, (n, 2)).astype(np.float32)
        score = geometric_verification_score(desc, coords, desc, coords + 3.0)
        assert score >= n * 0.9  # pure translation is affine-consistent

    def test_random_geometry_low_inliers(self, rng):
        n, d = 40, 16
        desc = rng.standard_normal((n, d)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=1, keepdims=True)
        c1 = rng.uniform(0, 14, (n, 2)).astype(np.float32)
        c2 = rng.uniform(0, 14, (n, 2)).astype(np.float32)  # scrambled
        score = geometric_verification_score(desc, c1, desc, c2)
        assert score <= n * 0.5

    def test_mutual_nn(self, rng):
        a = np.eye(4, 8, dtype=np.float32)
        b = np.eye(4, 8, dtype=np.float32)[::-1]
        ia, ib = mutual_nn_matches(a, b)
        assert len(ia) == 4
        np.testing.assert_array_equal(ib, 3 - ia)


class TestRerankDriver:
    def test_reorders_by_blended_score(self):
        scores = np.array([[0.9, 0.8, 0.7]])
        indices = np.array([[10, 20, 30]])
        # verifier strongly prefers gallery 30
        ver = {30: 1.0, 20: 0.0, 10: 0.0}
        new_s, new_i = rerank_shortlist(
            scores, indices, lambda q, g: ver[g], blend=0.1
        )
        assert new_i[0, 0] == 30
        assert np.all(np.diff(new_s[0]) <= 0)

    def test_blend_one_is_identity(self):
        scores = np.array([[0.9, 0.8]])
        indices = np.array([[1, 2]])
        new_s, new_i = rerank_shortlist(scores, indices, lambda q, g: 0.0, blend=1.0)
        np.testing.assert_array_equal(new_i, indices)

    def test_batched_matches_per_pair(self):
        rng = np.random.default_rng(0)
        Q, N, k = 3, 12, 4
        scores = -np.sort(-rng.uniform(0, 1, (Q, k)))
        indices = np.stack([rng.choice(N, k, replace=False) for _ in range(Q)])
        table = rng.uniform(0, 1, (Q, N))
        per_pair = rerank_shortlist(
            scores, indices, lambda q, g: table[q, g], blend=0.4
        )
        batched = rerank_shortlist_batched(
            scores, indices, lambda qs, gs: table[qs, gs], blend=0.4
        )
        np.testing.assert_allclose(batched[0], per_pair[0], rtol=1e-6)
        np.testing.assert_array_equal(batched[1], per_pair[1])


class TestBatchedCVNetRerank:
    def test_cvnet_batch_scorer_matches_loop(self, rng):
        m = CVNetRerank(backbone_name="resnet18", reduction_dim=16)
        x = jnp.zeros((1, 64, 64, 3))
        variables = m.init(jax.random.PRNGKey(0), x, x)

        Q, N, k = 2, 5, 3
        qimgs = rng.standard_normal((Q, 64, 64, 3)).astype(np.float32)
        gimgs = rng.standard_normal((N, 64, 64, 3)).astype(np.float32)
        qf = np.asarray(m.apply(variables, jnp.asarray(qimgs),
                                method="extract_featuremap"))
        gf = np.asarray(m.apply(variables, jnp.asarray(gimgs),
                                method="extract_featuremap"))

        scores = -np.sort(-rng.uniform(0, 1, (Q, k)))
        indices = np.stack([rng.choice(N, k, replace=False) for _ in range(Q)])

        def per_pair(qi, gi):
            s = m.apply(
                variables, jnp.asarray(qf[qi : qi + 1]),
                jnp.asarray(gf[gi : gi + 1]), method="score_from_featuremaps",
            )
            return float(np.asarray(s)[0])

        want = rerank_shortlist(scores, indices, per_pair, blend=0.5)
        # chunk=4 forces a padded tail chunk (6 pairs -> 4 + 2pad)
        scorer = make_cvnet_batch_scorer(m, variables, qf, gf, chunk=4)
        got = rerank_shortlist_batched(scores, indices, scorer, blend=0.5)
        np.testing.assert_allclose(got[0], want[0], rtol=1e-4, atol=1e-6)
        np.testing.assert_array_equal(got[1], want[1])
