"""SuperGlobal-style reranking with global features only.

SuperGlobal (Shao et al., "Global Features are All You Need for Image
Retrieval and Reranking", ICCV 2023) is one of the comparison methods the
reference's research plan targets (reference: memo.md) but never
implemented.  The reranking stage needs NO local features and NO extra
model: within the top-M shortlist of each query,

* every candidate's descriptor is refined by GeM-aggregating it with its
  K nearest neighbors INSIDE the shortlist (p -> inf approaches
  elementwise max; the paper's database-side expansion),
* the query is refined by mean-aggregating it with its top few candidates
  (the paper's query-side expansion),

and the shortlist is re-scored with the refined vectors, blended with the
first-stage scores.  Everything is batched linear algebra over the
[M, D] shortlist — a handful of matmuls per query, XLA/MXU-friendly,
O(Q * M * (M + D)) total.
"""

from __future__ import annotations

import numpy as np

__all__ = ["gem_aggregate", "superglobal_rerank"]


def gem_aggregate(vecs: np.ndarray, p: float = 100.0, axis: int = 0):
    """Signed-power GeM aggregation of descriptor sets along ``axis``.

    ``sign(m) * |m|^(1/p)`` of ``m = mean(sign(v) * |v|^p)`` — handles the
    negative entries of L2-normalized descriptors while keeping both GeM
    limits exact: p=1 is the plain mean; p -> inf approaches the signed
    entry of largest magnitude (elementwise "max pooling", the paper's
    database-side expansion limit).
    """
    vecs = np.asarray(vecs, np.float64)
    m = np.mean(np.sign(vecs) * np.abs(vecs) ** p, axis=axis)
    return (np.sign(m) * np.abs(m) ** (1.0 / p)).astype(np.float32)


def superglobal_rerank(
    qvecs: np.ndarray,
    gvecs: np.ndarray,
    scores: np.ndarray,
    indices: np.ndarray,
    knn: int = 10,
    qe_top: int = 3,
    p: float = 100.0,
    beta: float = 0.5,
):
    """Rerank top-M shortlists with refined global descriptors.

    Args:
      qvecs: [Q, D] L2-normalized query descriptors.
      gvecs: [N, D] L2-normalized gallery descriptors.
      scores: [Q, M] first-stage scores (descending).
      indices: [Q, M] gallery ids of the shortlist.
      knn: neighbors (within the shortlist) for candidate refinement.
      qe_top: top candidates mean-aggregated into the refined query.
      p: GeM power for candidate refinement (large = ~elementwise max).
      beta: weight of the first-stage score in the blend.

    Returns:
      (new_scores [Q, M], new_indices [Q, M]) reordered descending.
    """
    qvecs = np.asarray(qvecs, np.float32)
    gvecs = np.asarray(gvecs, np.float32)
    scores = np.asarray(scores, np.float32)
    indices = np.asarray(indices)
    Q, M = scores.shape
    out_s = np.empty_like(scores)
    out_i = np.empty_like(indices)

    for qi in range(Q):
        cand = gvecs[indices[qi]]  # [M, D]
        # query-side expansion: mean of the query and its best candidates
        q_ref = np.concatenate([qvecs[qi : qi + 1], cand[:qe_top]], axis=0)
        q_ref = q_ref.mean(axis=0)
        q_ref /= np.linalg.norm(q_ref) + 1e-12

        # database-side expansion inside the shortlist
        k = min(knn, M - 1)
        if k > 0:
            sim = cand @ cand.T  # [M, M]
            np.fill_diagonal(sim, -np.inf)
            nbr = np.argpartition(-sim, k - 1, axis=1)[:, :k]  # [M, k]
            group = np.concatenate(
                [cand[:, None, :], cand[nbr]], axis=1
            )  # [M, 1+k, D]
            cand_ref = gem_aggregate(group, p=p, axis=1)
        else:
            cand_ref = cand
        cand_ref /= np.linalg.norm(cand_ref, axis=1, keepdims=True) + 1e-12

        refined = cand_ref @ q_ref  # [M]
        combined = beta * scores[qi] + (1.0 - beta) * refined
        order = np.argsort(-combined, kind="stable")
        out_s[qi] = combined[order]
        out_i[qi] = indices[qi][order]
    return out_s, out_i
