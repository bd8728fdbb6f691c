"""Similarity search: dense cosine ranking and top-k.

The reference ranks by a dense matmul + full argsort on host
(reference: iris_evaluate.py:383-386).  Here the matmul + top-k runs on
device; ``rank_full`` reproduces the full [db, nq] rank matrix the
Revisited evaluator consumes, while ``search_topk`` is the serving path
(top-k only — no full sort).  ICI-sharded variants live in
``research_image_retrieval_tpu.parallel``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["cosine_similarity", "search_topk", "rank_full"]


def cosine_similarity(queries: jnp.ndarray, gallery: jnp.ndarray) -> jnp.ndarray:
    """[Q, D] x [N, D] -> [Q, N] similarity (inputs assumed L2-normalized).

    fp32 MXU matmul: descriptors are unit-norm so cosine == dot.
    """
    return jnp.matmul(
        queries.astype(jnp.float32),
        gallery.astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
    )


def search_topk(queries, gallery, k: int = 100):
    """Top-k gallery indices + scores per query.

    Returns:
      (scores [Q, k], indices [Q, k]) — descending score order.
    """
    sims = cosine_similarity(jnp.asarray(queries), jnp.asarray(gallery))
    scores, idx = jax.lax.top_k(sims, k)
    return scores, idx


def rank_full(queries, gallery) -> np.ndarray:
    """Full rank matrix in the reference evaluator's layout: [db, nq].

    ranks[r, q] = gallery index at rank r for query q (best first) —
    the layout ``compute_map`` consumes (reference: iris_evaluate.py:386).
    """
    sims = cosine_similarity(jnp.asarray(queries), jnp.asarray(gallery))
    order = jnp.argsort(-sims, axis=1)  # [Q, N] best-first
    return np.asarray(order).T
