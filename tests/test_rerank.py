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


class TestGeometricVerificationBatch:
    """Vectorized RANSAC (geometric_verification_batch) against the
    sequential per-pair verifier on structured geometry."""

    def _pair(self, rng, L=32, D=16, affine=None, outliers=0):
        desc = rng.standard_normal((L, D)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=1, keepdims=True)
        ca = rng.uniform(0, 13, (L, 2)).astype(np.float32)
        if affine is None:
            cb = rng.uniform(0, 13, (L, 2)).astype(np.float32)
        else:
            M, t = affine
            cb = (ca @ M.T + t).astype(np.float32)
            if outliers:
                cb[:outliers] = rng.uniform(0, 13, (outliers, 2))
        return desc, ca, cb

    def test_consistent_geometry_high_counts(self):
        from research_image_retrieval_tpu.index import (
            geometric_verification_batch,
            geometric_verification_score,
        )

        rng = np.random.default_rng(17)
        P, L = 5, 32
        qd, qxy, gd, gxy = [], [], [], []
        want_seq = []
        for p in range(P):
            M = np.array([[1.1, 0.05], [-0.03, 0.95]])
            t = np.array([2.0, -1.0])
            desc, ca, cb = self._pair(rng, L=L, affine=(M, t), outliers=4)
            qd.append(desc); qxy.append(ca)
            gd.append(desc); gxy.append(cb)
            want_seq.append(
                geometric_verification_score(desc, ca, desc, cb)
            )
        got = geometric_verification_batch(
            np.stack(qd), np.stack(qxy), np.stack(gd), np.stack(gxy),
            chunk=3,  # force a padded tail chunk
        )
        # identical descriptors -> mutual matches are the identity, so
        # both implementations see the same match set; RANSAC sampling
        # differs but both find the full consensus (>= 28 exact inliers;
        # an outlier can land inside the radius by chance)
        np.testing.assert_array_equal(got, np.asarray(want_seq))
        assert np.all(got >= L - 4)

    def test_random_geometry_and_min_matches(self):
        from research_image_retrieval_tpu.index import (
            geometric_verification_batch,
        )

        rng = np.random.default_rng(3)
        desc, ca, cb = self._pair(rng, L=32)  # random geometry
        got = geometric_verification_batch(
            desc[None], ca[None], desc[None], cb[None]
        )
        assert got.shape == (1,)
        assert got[0] <= 8  # no consensus on random coords

        # descriptors with NO mutual matches above min_sim -> 0
        d2 = rng.standard_normal((32, 16)).astype(np.float32)
        d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
        got2 = geometric_verification_batch(
            desc[None], ca[None], (-desc)[None], cb[None], min_sim=0.9
        )
        assert got2[0] == 0.0
