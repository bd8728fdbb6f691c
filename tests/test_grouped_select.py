"""Exactness of the group-max pre-filter selection (the default exact engine)."""

import numpy as np

import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.index import search_topk
from research_image_retrieval_tpu.ops.topk_stream import (
    _grouped_exact_select,
    scan_streaming_topk,
)


def test_grouped_select_exact(rng):
    scores = jnp.asarray(rng.standard_normal((5, 3000)).astype(np.float32))
    s_ref, i_ref = jax.lax.top_k(scores, 40)
    s, i = _grouped_exact_select(scores, 40, group=128)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_grouped_select_few_groups_fallback(rng):
    scores = jnp.asarray(rng.standard_normal((3, 300)).astype(np.float32))
    s_ref, i_ref = jax.lax.top_k(scores, 50)  # 300/128 = 3 groups <= 50
    s, i = _grouped_exact_select(scores, 50, group=128)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_grouped_stream_matches_dense(rng):
    g = rng.standard_normal((2000, 32)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = g[:4] + 0.01
    _, i_ref = search_topk(q, g, k=15)
    _, i = scan_streaming_topk(q, g, k=15, chunk=512, grouped=True)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
