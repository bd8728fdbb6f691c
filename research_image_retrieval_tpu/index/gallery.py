"""Indexed-gallery serving with query-adaptive fusion.

TPU-native version of the reference's only "serve" loop
(reference: manus/7_AdaptiveHybridModel/modified/
adaptive_hybrid_retrieval_complete.py:347-433): descriptors are extracted
once into a device-resident gallery; per-query search applies QAFF fusion
to the gallery sets, a cosine matmul, and top-k — all in one jitted
program.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from research_image_retrieval_tpu.ops import l2_normalize

__all__ = ["HybridGallery"]


class HybridGallery:
    """Gallery of multi-descriptor sets with QAFF search.

    Args:
      model: an AdaptiveHybridModel (or any model exposing a
        ``descriptors`` method returning a tuple of per-type embeddings).
      variables: model variables.
      qaff: a QAFF module.
      qaff_variables: QAFF variables.
      batch_size: extraction batch size for ``add``.
    """

    def __init__(self, model, variables, qaff, qaff_variables, batch_size=32):
        self.model = model
        self.variables = variables
        self.qaff = qaff
        self.qaff_variables = qaff_variables
        self.batch_size = batch_size
        self._sets: list[np.ndarray] | None = None
        self.labels: np.ndarray | None = None
        self.paths: list[str] | None = None

        self._extract = jax.jit(
            lambda x: model.apply(variables, x, method="descriptors")
        )

        def _search(query_sets, gallery_sets, k):
            q_for_qaff = query_sets[0]  # SC-GeM guides fusion (:405)
            n = gallery_sets[0].shape[0]
            expanded = jnp.broadcast_to(q_for_qaff, (n, q_for_qaff.shape[-1]))
            fused_gallery = qaff.apply(
                qaff_variables, expanded, list(gallery_sets)
            )
            query_fused = sum(query_sets) / len(query_sets)  # equal weights
            sims = jnp.matmul(
                l2_normalize(query_fused, axis=-1),
                l2_normalize(fused_gallery, axis=-1).T,
                preferred_element_type=jnp.float32,
            )
            return jax.lax.top_k(sims, k)

        self._search = jax.jit(_search, static_argnums=(2,))

    def add(self, images, labels=None, paths: Sequence[str] | None = None):
        """Extract and append descriptor sets for a batch of images."""
        images = np.asarray(images)
        sets_acc: list[list[np.ndarray]] = []
        for i in range(0, len(images), self.batch_size):
            batch = jnp.asarray(images[i : i + self.batch_size])
            sets = self._extract(batch)
            sets_acc.append([np.asarray(s) for s in sets])
        new_sets = [
            np.concatenate([chunk[t] for chunk in sets_acc])
            for t in range(len(sets_acc[0]))
        ]
        if self._sets is None:
            self._sets = new_sets
            self.labels = np.asarray(labels) if labels is not None else None
            self.paths = list(paths) if paths is not None else None
        else:
            self._sets = [
                np.concatenate([old, new])
                for old, new in zip(self._sets, new_sets)
            ]
            if labels is not None:
                self.labels = np.concatenate([self.labels, np.asarray(labels)])
            if paths is not None:
                self.paths = (self.paths or []) + list(paths)

    def __len__(self):
        return 0 if self._sets is None else self._sets[0].shape[0]

    def search(self, query_image, top_k: int = 10):
        """Single-stage QAFF search.

        Returns:
          (scores [Q, k], indices [Q, k], paths list-of-lists or None)
        """
        if self._sets is None:
            raise ValueError("Gallery is empty. Call add() first.")
        q = jnp.asarray(np.asarray(query_image))
        if q.ndim == 3:
            q = q[None]
        query_sets = self._extract(q)
        k = min(top_k, len(self))
        scores, idx = self._search(
            tuple(query_sets), tuple(jnp.asarray(s) for s in self._sets), k
        )
        idx_np = np.asarray(idx)
        out_paths = (
            [[self.paths[j] for j in row] for row in idx_np]
            if self.paths is not None
            else None
        )
        return np.asarray(scores), idx_np, out_paths
