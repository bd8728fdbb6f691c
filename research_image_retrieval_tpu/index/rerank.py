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

__all__ = [
    "rerank_shortlist",
    "rerank_shortlist_batched",
    "make_cvnet_batch_scorer",
    "mutual_nn_matches",
    "geometric_verification_score",
]


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


def rerank_shortlist_batched(
    scores: np.ndarray,
    indices: np.ndarray,
    batch_scorer: Callable[[np.ndarray, np.ndarray], np.ndarray],
    blend: float = 0.5,
):
    """Re-score a top-k shortlist with one vectorized scorer call.

    The TPU-fit replacement for ``rerank_shortlist``'s per-pair Python
    loop: all Q*k (query, gallery) pairs go through ``batch_scorer`` in one
    call (the scorer jits/chunks internally — see
    ``make_cvnet_batch_scorer``), so a top-100 rerank of 70 queries is a
    handful of fixed-shape device programs instead of 7000 forwards.

    Args:
      scores: [Q, k] first-stage scores (descending).
      indices: [Q, k] gallery indices.
      batch_scorer: (query_idx [P], gallery_idx [P]) -> [P] scores.
      blend: weight of the first-stage score (1.0 = no change).

    Returns:
      (new_scores [Q, k], new_indices [Q, k]) reordered descending.
    """
    scores = np.asarray(scores)
    indices = np.asarray(indices)
    Q, k = scores.shape
    qids = np.repeat(np.arange(Q), k)
    ver = np.asarray(batch_scorer(qids, indices.reshape(-1))).reshape(Q, k)
    combined = blend * scores + (1.0 - blend) * ver
    order = np.argsort(-combined, axis=1, kind="stable")
    return (
        np.take_along_axis(combined, order, axis=1),
        np.take_along_axis(indices, order, axis=1),
    )


def make_cvnet_batch_scorer(model, variables, q_fmaps, g_fmaps, chunk: int = 16):
    """Batched CVNet pair scorer over cached feature maps.

    The reference's cached-feature rerank scores one pair per forward
    (reference: CVNet_Rerank_model.py:64-74); here pairs are gathered into
    fixed-size chunks and scored through ONE jitted
    ``score_from_featuremaps`` program (tail chunks padded, outputs
    dropped).

    Args:
      model: CVNetRerank module.
      variables: its variables.
      q_fmaps: [Q, H, W, C] cached query feature maps (numpy).
      g_fmaps: [N, H', W', C] cached gallery feature maps (numpy).
      chunk: pairs per device batch (one compile for all chunks).

    Returns:
      batch_scorer(qids [P], gids [P]) -> [P] match scores, for
      ``rerank_shortlist_batched``.
    """
    import jax
    import jax.numpy as jnp

    fn = jax.jit(
        lambda qf, gf: model.apply(
            variables, qf, gf, method="score_from_featuremaps"
        )
    )
    q_fmaps = np.asarray(q_fmaps)
    g_fmaps = np.asarray(g_fmaps)

    def scorer(qids, gids):
        qids = np.asarray(qids)
        gids = np.asarray(gids)
        P = len(qids)
        out = np.empty((P,), np.float32)
        for s in range(0, P, chunk):
            qc, gc = qids[s : s + chunk], gids[s : s + chunk]
            n = len(qc)
            if n < chunk:  # pad to the compiled batch shape
                qc = np.concatenate([qc, np.repeat(qc[-1:], chunk - n)])
                gc = np.concatenate([gc, np.repeat(gc[-1:], chunk - n)])
            got = fn(jnp.asarray(q_fmaps[qc]), jnp.asarray(g_fmaps[gc]))
            out[s : s + n] = np.asarray(got)[:n]
        return out

    return scorer


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
