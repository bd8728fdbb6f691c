"""Regression tests for the zero-padding phantom-hit bug.

A query whose k-th best cosine is NEGATIVE must never receive fabricated
score-0 hits from padded gallery rows (found by code review; reproduced
before the fix with scores [1, 0, 0, -1, -1] and phantom indices).
"""

import numpy as np

from research_image_retrieval_tpu.index import search_topk
from research_image_retrieval_tpu.ops.topk_stream import (
    scan_streaming_topk,
)
from research_image_retrieval_tpu.parallel import (
    make_mesh,
    sharded_search_topk,
    sharded_streaming_topk,
)


def negative_gallery():
    """1 aligned row + 9 anti-aligned rows; every real score is 1 or -1."""
    q = np.zeros((1, 8), np.float32)
    q[0, 0] = 1.0
    g = -np.tile(q, (10, 1))
    g[0] = q[0]
    return q, g.astype(np.float32)


class TestApproxServing:
    def test_high_recall_vs_exact(self, rng):
        from research_image_retrieval_tpu.ops.topk_stream import (
            approx_streaming_topk,
        )

        g = rng.standard_normal((2000, 32)).astype(np.float32)
        g /= np.linalg.norm(g, axis=1, keepdims=True)
        q = g[:6] + 0.01
        _, i_ref = search_topk(q, g, k=20)
        _, i_apx = approx_streaming_topk(q, g, k=20, chunk=512,
                                         compute_dtype=np.float32)
        ref_sets = [set(r) for r in np.asarray(i_ref)]
        apx_sets = [set(r) for r in np.asarray(i_apx)]
        recall = np.mean(
            [len(a & b) / len(b) for a, b in zip(apx_sets, ref_sets)]
        )
        assert recall >= 0.9, recall

    def test_padding_masked(self):
        from research_image_retrieval_tpu.ops.topk_stream import (
            approx_streaming_topk,
        )

        q, g = negative_gallery()
        s, i = approx_streaming_topk(q, g, k=5, chunk=4,
                                     compute_dtype=np.float32)
        assert np.asarray(s).min() <= -0.99  # no fabricated zero scores


class TestNoPhantomHits:
    def test_scan_streaming(self):
        q, g = negative_gallery()
        s_ref, i_ref = search_topk(q, g, k=5)
        s, i = scan_streaming_topk(q, g, k=5, chunk=4)  # forces padding
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
        assert np.asarray(s).min() <= -0.99  # real negatives, not zeros


    def test_sharded_paths(self):
        q, g = negative_gallery()
        mesh = make_mesh(data=8, model=1)
        s_ref, i_ref = search_topk(q, g, k=5)
        for fn in (sharded_search_topk, sharded_streaming_topk):
            s, i = fn(q, g, k=5, mesh=mesh)
            np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
            assert np.asarray(s).min() <= -0.99

    def test_sharded_streaming_pad_displacement(self):
        """k < shard_n with pad rows in the last shard: the pad must not
        displace the shard's only (negative-score) true winner before the
        merge (review finding: post-selection masking lost it)."""
        q = np.zeros((1, 4), np.float32)
        q[0, 0] = 1.0
        g = -np.tile(q, (10, 1)).astype(np.float32)  # cos -1 everywhere...
        g[9] = [-0.2, np.sqrt(1 - 0.04), 0, 0]  # ...except row 9 (cos -0.2)
        mesh = make_mesh(data=8, model=1)  # shard_n=2, last shard padded
        s, i = sharded_streaming_topk(q, g, k=1, mesh=mesh)
        assert int(np.asarray(i)[0, 0]) == 9
        assert abs(float(np.asarray(s)[0, 0]) - (-0.2)) < 1e-5
