"""Query expansion: classic alphaQE and the learned iterative expansion.

* ``alpha_query_expansion`` — alpha-weighted query expansion (Radenovic et
  al.): the expanded query is the score^alpha-weighted mean of its top-k
  neighbors plus the query itself, re-L2-normalized.  alpha=0 reduces to
  average QE.  This generalizes the reference's learned IQE and is the
  standard production QE.
* ``IterativeQueryExpansion`` — the reference's learned expansion
  (reference: manus/1_SPARSE/sparse_model.py:334-426): an MLP maps
  [query, mean(top-k)] -> expanded query; scores blend as
  gamma*initial + (1-gamma)*expanded, recursively up to max_iterations.
  The reference's per-query Python loop is a batched gather here.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.ops import l2_normalize

__all__ = ["alpha_query_expansion", "IterativeQueryExpansion"]


def alpha_query_expansion(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    k: int = 10,
    alpha: float = 3.0,
) -> jnp.ndarray:
    """alphaQE: expand each query with its top-k gallery neighbors.

    Args:
      queries: [Q, D] L2-normalized.
      gallery: [N, D] L2-normalized.
      k: neighbors to aggregate.
      alpha: score-power weighting (0 = plain average QE).

    Returns:
      [Q, D] expanded, L2-normalized queries.
    """
    queries = jnp.asarray(queries, jnp.float32)
    gallery = jnp.asarray(gallery, jnp.float32)
    sims = jnp.matmul(queries, gallery.T, preferred_element_type=jnp.float32)
    scores, idx = jax.lax.top_k(sims, min(k, gallery.shape[0]))  # [Q, k]
    neighbors = gallery[idx]  # [Q, k, D]
    w = jnp.clip(scores, 0.0, None) ** alpha  # [Q, k]
    agg = queries + jnp.einsum(
        "qk,qkd->qd", w, neighbors, preferred_element_type=jnp.float32
    )
    return l2_normalize(agg, axis=-1)


class IterativeQueryExpansion(nn.Module):
    """Learned iterative QE (reference: sparse_model.py:334-426)."""

    embed_dim: int
    top_k: int = 5
    max_iterations: int = 2
    gamma: float = 0.6

    @nn.compact
    def __call__(self, query_features, database_features):
        """Returns dict with expanded_query / initial_scores / final_scores."""
        expand_fc1 = nn.Dense(self.embed_dim, name="expansion_fc1")
        expand_fc2 = nn.Dense(self.embed_dim, name="expansion_fc2")
        db_norm = l2_normalize(database_features, axis=-1)

        def one_round(q):
            q_norm = l2_normalize(q, axis=-1)
            scores = jnp.matmul(
                q_norm, db_norm.T, preferred_element_type=jnp.float32
            )
            k = min(self.top_k, database_features.shape[0])
            _, idx = jax.lax.top_k(scores, k)
            avg_top = jnp.mean(database_features[idx], axis=1)  # [Q, D]
            combined = jnp.concatenate([q, avg_top], axis=1)
            expanded = expand_fc2(nn.relu(expand_fc1(combined)))
            exp_scores = jnp.matmul(
                l2_normalize(expanded, axis=-1), db_norm.T,
                preferred_element_type=jnp.float32,
            )
            final = self.gamma * scores + (1.0 - self.gamma) * exp_scores
            return expanded, scores, exp_scores, final

        q = query_features
        initial_scores = None
        final_scores = None
        exp_scores = None
        for _ in range(self.max_iterations):
            q, scores, exp_scores, final = one_round(q)
            if initial_scores is None:
                initial_scores = scores
            final_scores = final
        return {
            "expanded_query": q,
            "initial_scores": initial_scores,
            "expanded_scores": exp_scores,
            "final_scores": final_scores,
        }
