"""Quantized (int8) streaming top-k engine correctness.

The int8 serving engine (ops/topk_stream.int8_streaming_topk) halves
the HBM traffic of the score stream by storing the gallery as symmetric
per-row int8; selection and merge are exact w.r.t. the quantized score
matrix.  These tests pin three properties:

1. the quantizer's per-element error bound (scale/2),
2. EXACTNESS on integer-valued data (scale 1, no rounding): the int8
   engine must reproduce the dense fp32 reference bit-for-bit,
3. high recall vs the exact fp32 engine on realistic normalized
   descriptors, and correct n_valid pad masking.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from research_image_retrieval_tpu.index import search_topk
from research_image_retrieval_tpu.parallel import (
    make_mesh,
    sharded_streaming_topk,
)
from research_image_retrieval_tpu.ops.topk_stream import (
    int8_streaming_topk,
    quantize_gallery_int8,
    scan_streaming_topk,
)


def _unit(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


class TestQuantizer:
    def test_roundtrip_error_bound(self, rng):
        g = _unit(rng, 257, 96)
        q, s = quantize_gallery_int8(g)
        assert np.asarray(q).dtype == np.int8
        deq = np.asarray(q, np.float32) * np.asarray(s)[:, None]
        err = np.abs(deq - g)
        bound = np.asarray(s)[:, None] / 2 + 1e-7
        assert (err <= bound).all()

    def test_zero_row_safe(self, rng):
        g = _unit(rng, 8, 32)
        g[3] = 0.0
        q, s = quantize_gallery_int8(g)
        assert np.isfinite(np.asarray(s)).all()
        assert (np.asarray(q)[3] == 0).all()

    def test_full_range_used(self, rng):
        g = _unit(rng, 64, 48)
        q, _ = quantize_gallery_int8(g)
        # the per-row max maps to +-127 exactly
        assert np.abs(np.asarray(q)).max(axis=1).min() == 127


class TestInt8Engine:
    def test_integer_data_bit_exact(self, rng):
        """With integer-valued inputs in [-127, 127] the quantizer is a
        no-op (scale = max/127 reconstructs integers exactly after the
        s32 contraction), so the engine must match the dense reference
        on both indices and scores."""
        g = rng.integers(-127, 128, size=(900, 40)).astype(np.float32)
        qs = rng.integers(-127, 128, size=(5, 40)).astype(np.float32)
        # pin the per-row max to exactly 127 so scale == 1 and the
        # quantizer is the identity on these integer inputs
        g[:, 0] = 127.0
        qs[:, 0] = 127.0
        qg, gs = quantize_gallery_int8(g)
        s, i = int8_streaming_topk(qs, qg, gs, k=20, chunk=256)
        s_ref, i_ref = search_topk(qs, g, k=20)
        # integer scores are exactly representable; ordering identical
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                                   rtol=1e-6)
        # ties between equal integer scores may order differently; check
        # the score the reference assigns to each returned index matches
        dense = qs @ g.T
        got = np.take_along_axis(dense, np.asarray(i), axis=1)
        np.testing.assert_allclose(got, np.asarray(s_ref), rtol=1e-6)

    def test_recall_vs_exact(self, rng):
        qs = _unit(rng, 9, 128)
        g = _unit(rng, 4096, 128)
        qg, gs = quantize_gallery_int8(g)
        s8, i8 = int8_streaming_topk(qs, qg, gs, k=10, chunk=1024)
        _, i_ref = scan_streaming_topk(qs, g, k=10, chunk=1024)
        i8, i_ref = np.asarray(i8), np.asarray(i_ref)
        recall = np.mean([
            len(set(i8[q]) & set(i_ref[q])) / i_ref.shape[1]
            for q in range(i_ref.shape[0])
        ])
        assert recall >= 0.9, recall
        # top-1 must survive quantization on well-separated data
        assert (i8[:, 0] == i_ref[:, 0]).mean() >= 0.8

    def test_self_retrieval(self, rng):
        """Every gallery row must retrieve itself at rank 1 (quantization
        is monotone for the self-pair: q.q is the max by Cauchy-Schwarz
        and survives symmetric rounding on unit-norm data)."""
        g = _unit(rng, 512, 64)
        qg, gs = quantize_gallery_int8(g)
        _, i = int8_streaming_topk(g[:32], qg, gs, k=1, chunk=128)
        assert (np.asarray(i)[:, 0] == np.arange(32)).all()

    def test_n_valid_masks_padding(self, rng):
        """Rows past n_valid must never appear, even when they would win:
        plant a perfect duplicate of each query in the padded region."""
        qs = _unit(rng, 4, 32)
        g = _unit(rng, 60, 32)
        g_padded = np.concatenate([g, qs], axis=0)  # pads are exact hits
        qg, gs = quantize_gallery_int8(g_padded)
        _, i = int8_streaming_topk(qs, qg, gs, k=8, chunk=16, n_valid=60)
        assert (np.asarray(i) < 60).all()

    def test_approx_selection(self, rng):
        """selection='approx' keeps high recall vs the exact selector on
        the same quantized gallery (cross-chunk merge stays exact)."""
        qs = _unit(rng, 6, 96)
        g = _unit(rng, 4096, 96)
        qg, gs = quantize_gallery_int8(g)
        _, i_ex = int8_streaming_topk(qs, qg, gs, k=10, chunk=1024)
        _, i_ap = int8_streaming_topk(qs, qg, gs, k=10, chunk=1024,
                                      selection="approx",
                                      recall_target=0.99)
        i_ex, i_ap = np.asarray(i_ex), np.asarray(i_ap)
        recall = np.mean([
            len(set(i_ap[q]) & set(i_ex[q])) / 10 for q in range(6)
        ])
        assert recall >= 0.8, recall

    def test_bad_selection_raises(self, rng):
        qs = _unit(rng, 2, 32)
        qg, gs = quantize_gallery_int8(_unit(rng, 64, 32))
        with pytest.raises(ValueError, match="selection"):
            int8_streaming_topk(qs, qg, gs, k=4, selection="nope")

    def test_non_divisible_chunk(self, rng):
        qs = _unit(rng, 3, 48)
        g = _unit(rng, 1001, 48)
        qg, gs = quantize_gallery_int8(g)
        s, i = int8_streaming_topk(qs, qg, gs, k=7, chunk=256)
        _, i_ref = int8_streaming_topk(qs, qg, gs, k=7, chunk=1001)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


class TestShardedInt8:
    def test_matches_single_device(self, rng):
        """engine='int8' over the 8-device mesh == single-device int8
        (quantize-then-shard == shard-then-quantize: per-row scheme)."""
        qs = _unit(rng, 5, 64)
        g = _unit(rng, 256, 64)
        qg, gs = quantize_gallery_int8(g)
        s_ref, i_ref = int8_streaming_topk(qs, qg, gs, k=9, chunk=32)
        mesh = make_mesh(data=8, model=1)
        s, i = sharded_streaming_topk(qs, g, k=9, mesh=mesh, chunk=16,
                                      engine="int8")
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                                   rtol=1e-6)

    def test_prequantized_shards(self, rng):
        """Passing the int8 index + scales directly (serving path) must
        equal the float-gallery path that quantizes internally."""
        qs = _unit(rng, 4, 64)
        g = _unit(rng, 128, 64)
        qg, gs = quantize_gallery_int8(g)
        mesh = make_mesh(data=8, model=1)
        s_f, i_f = sharded_streaming_topk(qs, g, k=7, mesh=mesh, chunk=8,
                                          engine="int8")
        s_q, i_q = sharded_streaming_topk(qs, np.asarray(qg), k=7,
                                          mesh=mesh, chunk=8,
                                          engine="int8",
                                          g_scales=np.asarray(gs))
        np.testing.assert_array_equal(np.asarray(i_q), np.asarray(i_f))
        np.testing.assert_allclose(np.asarray(s_q), np.asarray(s_f),
                                   rtol=1e-6)

    def test_prequantized_requires_int8_engine_and_scales(self, rng):
        qg, gs = quantize_gallery_int8(_unit(rng, 64, 32))
        mesh = make_mesh(data=8, model=1)
        with pytest.raises(ValueError, match="engine='int8'"):
            sharded_streaming_topk(_unit(rng, 2, 32), np.asarray(qg),
                                   k=4, mesh=mesh, g_scales=np.asarray(gs))
        with pytest.raises(ValueError, match="g_scales"):
            sharded_streaming_topk(_unit(rng, 2, 32), np.asarray(qg),
                                   k=4, mesh=mesh, engine="int8")

    def test_pad_rows_masked(self, rng):
        """N not divisible by shards: a pad row must not displace the only
        true (negative-score) winner of the last shard."""
        q = np.zeros((1, 4), np.float32)
        q[0, 0] = 1.0
        g = -np.tile(q, (10, 1)).astype(np.float32)
        g[9] = [-0.2, np.sqrt(1 - 0.04), 0, 0]
        mesh = make_mesh(data=8, model=1)  # shard_n=2, last shard padded
        s, i = sharded_streaming_topk(q, g, k=1, mesh=mesh, engine="int8")
        assert int(np.asarray(i)[0, 0]) == 9
        assert abs(float(np.asarray(s)[0, 0]) - (-0.2)) < 2e-2
