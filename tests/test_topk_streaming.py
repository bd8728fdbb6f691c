"""Streaming top-k correctness vs the dense reference path.

The Pallas kernel runs in interpreter mode on CPU (tests); the compiled
path is exercised by bench.py on the TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.index import search_topk
from research_image_retrieval_tpu.ops.topk_pallas import (
    pallas_streaming_topk,
    scan_streaming_topk,
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


class TestPallasStreaming:
    """Interpreter-mode equivalence (CPU); compiled path runs on TPU."""

    def test_matches_dense_interpret(self, rng, monkeypatch):
        from jax.experimental.pallas import tpu as pltpu

        q, g = _data(rng, n=512, q=8, d=32)
        s_ref, i_ref = search_topk(q, g, k=16)
        with pltpu.force_tpu_interpret_mode():
            s, i = pallas_streaming_topk(q, g, k=16, block=128)
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))

    def test_padding_paths_interpret(self, rng):
        from jax.experimental.pallas import tpu as pltpu

        # Q not multiple of 8, N not multiple of block
        q, g = _data(rng, n=300, q=5, d=32)
        s_ref, i_ref = search_topk(q, g, k=8)
        with pltpu.force_tpu_interpret_mode():
            s, i = pallas_streaming_topk(q, g, k=8, block=128)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
