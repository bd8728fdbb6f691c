"""SuperGlobal-style global-feature reranking (memo.md target method)."""

import numpy as np

from research_image_retrieval_tpu.index import (
    gem_aggregate,
    search_topk,
    superglobal_rerank,
)


def test_gem_aggregate_limits(rng):
    v = rng.standard_normal((5, 16)).astype(np.float32)
    np.testing.assert_allclose(gem_aggregate(v, p=1.0), v.mean(0), atol=1e-5)
    big = gem_aggregate(v, p=200.0)
    idx = np.argmax(np.abs(v), axis=0)
    want = v[idx, np.arange(16)]
    np.testing.assert_allclose(np.abs(big), np.abs(want), rtol=0.1)
    np.testing.assert_array_equal(np.sign(big), np.sign(want))


def test_identity_when_blend_only(rng):
    g = rng.standard_normal((50, 8)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = g[:3]
    s, i = search_topk(q, g, k=10)
    s, i = np.asarray(s), np.asarray(i)
    ns, ni = superglobal_rerank(q, g, s, i, beta=1.0)
    np.testing.assert_array_equal(ni, i)  # beta=1 keeps first-stage order
    np.testing.assert_allclose(ns, s, atol=1e-6)


def test_distractor_sinks_after_query_refinement(rng):
    """A distractor beating half the positives first-stage sinks once the
    query is refined toward the positives' cluster (deterministic
    geometry: positives hug e1; the query has an off-cluster component;
    the distractor aligns with the query's off-cluster part)."""
    D = 8
    e = np.eye(D, dtype=np.float32)

    def unit(v):
        return v / np.linalg.norm(v)

    # 8 positives near e1 with small +-jitter on e4 (sims to q straddle d)
    positives = np.stack([
        unit(e[0] + 0.12 * ((-1) ** k) * (k / 8.0) * e[3]) for k in range(8)
    ])
    query = unit(0.9 * e[0] + 0.45 * e[1])[None]
    # distractor: rides the query's off-cluster e2 component hard enough
    # to land mid-shortlist first-stage (q.d ~ 0.8975, inside the
    # positives' 0.895-0.900 band)
    distractor = unit(0.7222 * e[0] + 0.55 * e[1] + 0.419 * e[2])
    gallery = np.concatenate([positives, distractor[None]], axis=0)

    s, i = map(np.asarray, search_topk(query, gallery, k=9))
    rank_before = int(np.where(i[0] == 8)[0][0])
    assert 1 < rank_before < 8  # genuinely mid-shortlist first-stage

    ns, ni = superglobal_rerank(query, gallery, s, i, knn=4, qe_top=3,
                                beta=0.0)
    rank_after = int(np.where(ni[0] == 8)[0][0])
    assert rank_after > rank_before
    assert rank_after >= 7  # refined query lives in the cluster; d sinks


def test_shapes_and_monotone_blend(rng):
    g = rng.standard_normal((40, 8)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = rng.standard_normal((4, 8)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    s, i = map(np.asarray, search_topk(q, g, k=15))
    ns, ni = superglobal_rerank(q, g, s, i, knn=5)
    assert ns.shape == s.shape and ni.shape == i.shape
    assert np.all(np.diff(ns, axis=1) <= 1e-6)  # descending
    for qi in range(4):  # permutation of the same shortlist
        assert set(ni[qi]) == set(i[qi])


def test_eval_driver_superglobal_flag(tmp_path):
    """The --superglobal eval path runs end-to-end (synthetic fixture) and
    returns a valid result structure."""
    from research_image_retrieval_tpu.evaluation.driver import evaluate
    from research_image_retrieval_tpu.utils.config import EvalConfig

    cfg = EvalConfig(
        model="gem_r50",
        model_overrides={"backbone_name": "resnet18", "outputdim": 16,
                         "num_classes": 8},
        datasets=("roxford5k",),
        data_root=str(tmp_path),  # empty -> synthetic fallback
        imsize=32,
        superglobal=True,
        sg_m=12,
    )
    res = evaluate(cfg)["roxford5k"]  # (E, M, H) mAP percents
    assert len(res) == 3
    for v in res:
        assert 0.0 <= float(v) <= 100.0
