"""Reranking: learned correlation verification and geometric verification.

Two reranking paths over an initial top-k shortlist:

* ``rerank_shortlist`` — generic driver: re-score each (query, candidate)
  pair with a scorer (e.g. CVNetRerank.score_from_featuremaps), blend with
  the first-stage cosine score, and reorder.  This is the CVNet serving
  flow (reference: models/cvnet_modules/CVNet_Rerank_model.py:49-74).
* ``geometric_verification_score`` — DELG-style local-feature check:
  mutual nearest-neighbor matches between attention-selected local
  descriptors, affine RANSAC on host, inlier count as the score
  (the reference exposes local descriptors for this at
  models/delg.py:109-124 but ships no verifier).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

__all__ = ["rerank_shortlist", "mutual_nn_matches", "geometric_verification_score"]


def rerank_shortlist(
    scores: np.ndarray,
    indices: np.ndarray,
    pair_scorer: Callable[[int, int], float],
    blend: float = 0.5,
):
    """Re-score and reorder a top-k shortlist.

    Args:
      scores: [Q, k] first-stage scores (descending).
      indices: [Q, k] gallery indices.
      pair_scorer: (query_idx, gallery_idx) -> verification score.
      blend: weight of the first-stage score (1.0 = no change).

    Returns:
      (new_scores [Q, k], new_indices [Q, k]) reordered descending.
    """
    scores = np.asarray(scores)
    indices = np.asarray(indices)
    Q, k = scores.shape
    out_scores = np.empty_like(scores)
    out_idx = np.empty_like(indices)
    for qi in range(Q):
        ver = np.array([pair_scorer(qi, int(g)) for g in indices[qi]])
        combined = blend * scores[qi] + (1.0 - blend) * ver
        order = np.argsort(-combined, kind="stable")
        out_scores[qi] = combined[order]
        out_idx[qi] = indices[qi][order]
    return out_scores, out_idx


def mutual_nn_matches(desc_a: np.ndarray, desc_b: np.ndarray, min_sim: float = 0.0):
    """Mutual nearest-neighbor matches between two local descriptor sets.

    desc_a: [Na, D], desc_b: [Nb, D], both L2-normalized.
    Returns (idx_a, idx_b) index arrays of matched pairs.
    """
    sims = desc_a @ desc_b.T
    nn_ab = sims.argmax(axis=1)
    nn_ba = sims.argmax(axis=0)
    ia = np.arange(desc_a.shape[0])
    mutual = nn_ba[nn_ab] == ia
    good = mutual & (sims[ia, nn_ab] >= min_sim)
    return ia[good], nn_ab[good]


def geometric_verification_score(
    locals_a: np.ndarray,
    coords_a: np.ndarray,
    locals_b: np.ndarray,
    coords_b: np.ndarray,
    ransac_iters: int = 200,
    inlier_px: float = 2.0,
    min_matches: int = 4,
    seed: int = 0,
) -> float:
    """Affine-RANSAC inlier count between two images' local features.

    Args:
      locals_*: [N, D] L2-normalized local descriptors.
      coords_*: [N, 2] feature coordinates (feature-map units).

    Returns:
      Number of geometric inliers (0 when too few matches).
    """
    ia, ib = mutual_nn_matches(locals_a, locals_b)
    if len(ia) < min_matches:
        return 0.0
    pa = coords_a[ia].astype(np.float64)
    pb = coords_b[ib].astype(np.float64)
    n = len(pa)
    rng = np.random.default_rng(seed)

    def affine_from(idx):
        # solve [x y 1] @ M = x' for 3 point pairs (exact) via lstsq
        A = np.concatenate([pa[idx], np.ones((len(idx), 1))], axis=1)
        M, *_ = np.linalg.lstsq(A, pb[idx], rcond=None)
        return M

    A_all = np.concatenate([pa, np.ones((n, 1))], axis=1)
    best = 0
    for _ in range(ransac_iters):
        sample = rng.choice(n, size=3, replace=False)
        try:
            M = affine_from(sample)
        except np.linalg.LinAlgError:
            continue
        pred = A_all @ M
        err = np.linalg.norm(pred - pb, axis=1)
        inliers = int((err < inlier_px).sum())
        best = max(best, inliers)
    return float(best)
