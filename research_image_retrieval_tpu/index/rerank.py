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
* ``geometric_verification_batch`` — the same check vectorized the TPU
  way: ALL pairs' matching + ALL RANSAC hypotheses in one jitted
  fixed-shape program (batched 3x3 solves via ``jnp.linalg.solve``,
  hypothesis sampling as a [pairs, iters, 3] gather) — no per-pair
  Python loop, no per-hypothesis lstsq.
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
    "geometric_verification_batch",
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


def geometric_verification_batch(
    q_desc: np.ndarray,
    q_xy: np.ndarray,
    g_desc: np.ndarray,
    g_xy: np.ndarray,
    ransac_iters: int = 200,
    inlier_px: float = 2.0,
    min_sim: float = 0.0,
    min_matches: int = 4,
    seed: int = 0,
    chunk: int = 32,
) -> np.ndarray:
    """Affine-RANSAC inlier counts for a BATCH of image pairs.

    The vectorized redesign of ``geometric_verification_score``'s
    per-pair / per-hypothesis host loop (the reference shape this
    replaces would be 200 x pairs sequential lstsq solves): pairs are
    chunked to a fixed shape and one jitted program per chunk does

    * mutual-NN matching for every pair at once (one einsum),
    * hypothesis sampling as index arithmetic over the VALID matches
      (valid slots sorted first; ``floor(u * n)`` indexes among them —
      duplicate picks yield singular systems that self-reject),
    * all ``ransac_iters`` 3-point affine solves as one batched
      ``jnp.linalg.solve`` over [chunk, iters, 3, 3] (singular systems
      produce non-finite predictions, which simply count 0 inliers),
    * inlier counting as one masked reduction.

    Args:
      q_desc / g_desc: [P, L, D] L2-normalized local descriptors per
        pair side (gather rows before calling: ``q_desc_all[qids]``).
      q_xy / g_xy: [P, L, 2] coordinates.
      chunk: pairs per compiled program (tail padded).

    Returns:
      [P] float inlier counts (0 where fewer than ``min_matches``
      mutual matches).
    """
    import jax
    import jax.numpy as jnp

    q_desc = np.asarray(q_desc, np.float32)
    g_desc = np.asarray(g_desc, np.float32)
    q_xy = np.asarray(q_xy, np.float32)
    g_xy = np.asarray(g_xy, np.float32)
    P, L, _ = q_desc.shape
    H = int(ransac_iters)

    @jax.jit
    def score_chunk(qd, qxy, gd, gxy, u):
        C = qd.shape[0]
        sims = jnp.einsum(
            "cld,cmd->clm", qd, gd, preferred_element_type=jnp.float32
        )
        nn_ab = jnp.argmax(sims, axis=2)  # [C, L] q-side NN in gallery
        nn_ba = jnp.argmax(sims, axis=1)  # [C, L] gallery-side NN in q
        ar = jnp.arange(L)
        mutual = jnp.take_along_axis(nn_ba, nn_ab, axis=1) == ar[None, :]
        simv = jnp.take_along_axis(sims, nn_ab[:, :, None], axis=2)[..., 0]
        valid = mutual & (simv >= min_sim)  # [C, L]
        n = valid.sum(axis=1)  # [C] mutual-match count

        # stable-sort valid match slots to the front so sampling can
        # index [0, n) uniformly
        order = jnp.argsort(jnp.where(valid, 0, 1), axis=1, stable=True)
        pa = jnp.take_along_axis(qxy, order[:, :, None], axis=1)  # [C, L, 2]
        pb = jnp.take_along_axis(
            jnp.take_along_axis(gxy, nn_ab[:, :, None], axis=1),
            order[:, :, None], axis=1,
        )  # [C, L, 2] matched gallery coords, same slot order
        slot_valid = ar[None, :] < n[:, None]  # [C, L]

        idx = jnp.clip(
            (u * n[:, None, None].astype(jnp.float32)).astype(jnp.int32),
            0, L - 1,
        )  # [C, H, 3] samples among the valid slots
        flat = idx.reshape(C, H * 3)
        sa = jnp.take_along_axis(pa, flat[:, :, None], axis=1)
        sb = jnp.take_along_axis(pb, flat[:, :, None], axis=1)
        sa = sa.reshape(C, H, 3, 2)
        sb = sb.reshape(C, H, 3, 2)
        A = jnp.concatenate([sa, jnp.ones((C, H, 3, 1), sa.dtype)], axis=-1)
        M = jnp.linalg.solve(A, sb)  # [C, H, 3, 2]

        A_all = jnp.concatenate(
            [pa, jnp.ones((C, L, 1), pa.dtype)], axis=-1
        )  # [C, L, 3]
        pred = jnp.einsum("cli,chij->chlj", A_all, M)  # [C, H, L, 2]
        err2 = jnp.sum((pred - pb[:, None, :, :]) ** 2, axis=-1)
        ok = (err2 < inlier_px * inlier_px) & slot_valid[:, None, :]
        best = ok.sum(axis=-1).max(axis=1)  # [C]
        return jnp.where(n >= min_matches, best, 0).astype(jnp.float32)

    rng = np.random.default_rng(seed)
    out = np.empty((P,), np.float32)
    for s in range(0, P, chunk):
        e = min(s + chunk, P)
        c = e - s
        sl = slice(s, e)
        pad = chunk - c
        take = lambda a: (
            np.concatenate([a[sl], np.repeat(a[e - 1 : e], pad, 0)])
            if pad else a[sl]
        )
        u = rng.random((chunk, H, 3), np.float32)
        got = np.asarray(
            score_chunk(take(q_desc), take(q_xy), take(g_desc), take(g_xy),
                        jnp.asarray(u))
        )
        out[sl] = got[:c]
    return out
