"""Streaming top-k correctness vs the dense reference path.

The grouped exact selection is the default engine; bench.py exercises the
compiled path on the TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.index import search_topk
from research_image_retrieval_tpu.ops.topk_stream import (
    scan_streaming_topk,
    streaming_topk,
)


def _data(rng, n=1000, q=7, d=64):
    g = rng.standard_normal((n, d)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    qs = rng.standard_normal((q, d)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    return qs, g


class TestScanStreaming:
    def test_matches_dense(self, rng):
        q, g = _data(rng)
        s_ref, i_ref = search_topk(q, g, k=25)
        s, i = scan_streaming_topk(q, g, k=25, chunk=128)
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))

    def test_non_divisible_chunk(self, rng):
        q, g = _data(rng, n=1001)
        s_ref, i_ref = search_topk(q, g, k=10)
        s, i = scan_streaming_topk(q, g, k=10, chunk=256)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))

    def test_k_larger_than_chunk(self, rng):
        q, g = _data(rng, n=600)
        s_ref, i_ref = search_topk(q, g, k=150)
        s, i = scan_streaming_topk(q, g, k=150, chunk=100)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))

    def test_grouped_vs_plain_sort_identical(self, rng):
        """The grouped pre-filter default must be bit-identical to the
        plain per-chunk full sort (the slow-but-obviously-correct path)."""
        q, g = _data(rng, n=3000, q=9, d=48)
        s_a, i_a = scan_streaming_topk(q, g, k=40, chunk=1500, grouped=True)
        s_b, i_b = scan_streaming_topk(q, g, k=40, chunk=1500, grouped=False)
        np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_b))
        np.testing.assert_array_equal(np.asarray(s_a), np.asarray(s_b))

    def test_dispatch_exact_default(self, rng):
        q, g = _data(rng, n=700)
        s_ref, i_ref = search_topk(q, g, k=12)
        s, i = streaming_topk(q, g, k=12)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


class TestScorePrecision:
    """The ``exact_fp32_scores`` mode: Precision.HIGHEST scoring for a
    bf16 gallery.  "Exact" by default means exact top-k under the
    platform's default matmul precision (on TPU: bf16-quantized inputs,
    fp32 accumulation — the TF32-default semantics class of the
    reference's torch scoring); HIGHEST restores true fp32 scores."""

    def test_highest_matches_dense_on_bf16_gallery(self):
        rng = np.random.default_rng(78)
        q, g = _data(rng, n=1500, q=9, d=96)
        g16 = jnp.asarray(g, jnp.bfloat16)
        s_ref, i_ref = search_topk(q, np.asarray(g16, np.float32), k=30)
        s, i = scan_streaming_topk(q, g16, k=30, chunk=400,
                                   exact_fp32_scores=True)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                                   rtol=1e-6, atol=1e-6)

    def test_highest_vs_default_same_indices(self):
        rng = np.random.default_rng(79)
        q, g = _data(rng, n=2000, q=7, d=64)
        g16 = jnp.asarray(g, jnp.bfloat16)
        s_a, i_a = scan_streaming_topk(q, g16, k=25, chunk=512,
                                       exact_fp32_scores=True)
        s_b, i_b = scan_streaming_topk(q, g16, k=25, chunk=512)
        np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_b))
        np.testing.assert_allclose(np.asarray(s_a), np.asarray(s_b),
                                   rtol=1e-5, atol=1e-5)
