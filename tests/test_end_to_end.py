"""End-to-end slice: GeM model -> extract -> rank -> Revisited mAP.

This is the framework's minimum viable pipeline (SURVEY.md build step 4):
everything between raw images and E/M/H mAP runs through public APIs on a
deterministic synthetic dataset.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.data import (
    SyntheticRetrievalDataset,
    make_synthetic_gnd,
)
from research_image_retrieval_tpu.evaluation import evaluate_revisited
from research_image_retrieval_tpu.index import (
    extract_vectors,
    multiscale_descriptor,
    rank_full,
    search_topk,
)
from research_image_retrieval_tpu.models import get_model, list_available_models


@pytest.fixture(scope="module")
def gem_small():
    """Small GeM model (resnet18 backbone) + initialized variables."""
    model = get_model("gem_r50", backbone_name="resnet18", outputdim=64,
                      num_classes=16)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(
        jax.random.PRNGKey(0), x, labels=jnp.zeros((1,), jnp.int32), train=False
    )
    return model, variables


class TestRegistry:
    def test_gem_registered(self):
        assert "gem_r50" in list_available_models()

    def test_table1_name(self):
        m = get_model("R50-GeM", backbone_name="resnet18", num_classes=8)
        assert m.backbone_name == "resnet18"

    def test_unknown_raises(self):
        with pytest.raises(KeyError, match="Unknown model"):
            get_model("nope_model")


class TestDualAPI:
    def test_train_forward(self, gem_small, rng):
        model, variables = gem_small
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
        y = jnp.asarray(np.array([1, 3]))
        (loss, logits), _ = model.apply(
            variables, x, labels=y, train=True, mutable=["batch_stats"]
        )
        assert np.isfinite(float(loss))
        assert logits.shape == (2, 16)

    def test_extract_is_normalized(self, gem_small, rng):
        model, variables = gem_small
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
        d = model.apply(variables, x, method="extract")
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(d), axis=1), 1.0, rtol=1e-5
        )

    def test_gradients_flow(self, gem_small, rng):
        model, variables = gem_small
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
        y = jnp.asarray(np.array([0, 2]))

        def loss_fn(params):
            (loss, _), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, labels=y, train=True, mutable=["batch_stats"],
            )
            return loss

        g = jax.grad(loss_fn)(variables["params"])
        leaf_norms = [float(jnp.abs(l).sum()) for l in jax.tree.leaves(g)]
        assert all(np.isfinite(leaf_norms))
        assert sum(leaf_norms) > 0


class TestExtraction:
    def test_variable_resolution_order(self, gem_small, rng):
        model, variables = gem_small
        extract = lambda x: model.apply(variables, x, method="extract")
        masked = lambda x, v: model.apply(variables, x, v, method="extract")
        sizes = [(40, 40), (52, 44), (40, 40), (64, 64), (52, 44)]
        imgs = [rng.standard_normal((h, w, 3)).astype(np.float32) for h, w in sizes]
        vecs = extract_vectors(masked, imgs)  # default: masked buckets
        assert vecs.shape == (5, 64)
        # per-image exact-shape extraction must match the padded-bucket
        # result, in input order
        for i, img in enumerate(imgs):
            solo = np.asarray(extract(jnp.asarray(img)[None]))[0]
            np.testing.assert_allclose(vecs[i], solo, rtol=2e-4, atol=1e-5)

    def test_exact_shape_fallback(self, gem_small, rng):
        """bucket=None groups by exact shape and needs no valid_hw arg."""
        model, variables = gem_small
        extract = lambda x: model.apply(variables, x, method="extract")
        sizes = [(40, 40), (52, 44), (40, 40)]
        imgs = [rng.standard_normal((h, w, 3)).astype(np.float32) for h, w in sizes]
        vecs = extract_vectors(extract, imgs, bucket=None)
        for i, img in enumerate(imgs):
            solo = np.asarray(extract(jnp.asarray(img)[None]))[0]
            np.testing.assert_allclose(vecs[i], solo, rtol=2e-4, atol=1e-5)

    def test_small_image_upscale_guard(self, gem_small, rng):
        model, variables = gem_small
        masked = lambda x, v: model.apply(variables, x, v, method="extract")
        tiny = [rng.standard_normal((20, 30, 3)).astype(np.float32)]
        vecs = extract_vectors(masked, tiny)
        assert np.all(np.isfinite(vecs))

    def test_multiscale_sum_normalize(self, gem_small, rng):
        model, variables = gem_small
        extract = lambda x: model.apply(variables, x, method="extract")
        x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
        ms = multiscale_descriptor(extract, x, scales=(1.0, 2**-0.5, 0.5))
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(ms), axis=1), 1.0, rtol=1e-5
        )
        # must differ from single-scale (the scales genuinely contribute)
        ss = np.asarray(extract(x))
        assert not np.allclose(np.asarray(ms), ss, atol=1e-3)

    def test_multiscale_scale_drop(self, gem_small, rng):
        """Scales shrinking below 36px are dropped, not crashed."""
        model, variables = gem_small
        extract = lambda x: model.apply(variables, x, method="extract")
        x = jnp.asarray(rng.standard_normal((1, 48, 48, 3)).astype(np.float32))
        ms = multiscale_descriptor(extract, x, scales=(1.0, 0.5))  # 24px dropped
        np.testing.assert_allclose(
            np.asarray(ms), np.asarray(extract(x)), rtol=1e-5
        )


class TestEndToEnd:
    def test_extract_rank_map(self, gem_small):
        model, variables = gem_small
        ds = SyntheticRetrievalDataset(
            num_classes=8, samples_per_class=6, image_size=48, seed=3
        )
        imgs, labels = ds.as_arrays()
        extract = lambda x, v=None: model.apply(variables, x, v, method="extract")
        vecs = extract_vectors(extract, list(imgs))

        q_idx = np.arange(0, len(ds), 6)  # one query per class
        gnd = make_synthetic_gnd(labels, q_idx)
        ranks = rank_full(vecs[q_idx], vecs)
        res = evaluate_revisited(ranks, gnd, dataset="roxford5k")

        # random-permutation baseline for the same gnd
        rng = np.random.default_rng(0)
        rand_ranks = np.stack(
            [rng.permutation(len(ds)) for _ in q_idx], axis=1
        )
        rand = evaluate_revisited(rand_ranks, gnd, dataset="roxford5k")

        assert 0.0 <= res.map_medium <= 100.0
        # even an untrained CNN separates procedural color/pattern classes
        assert res.map_medium > rand.map_medium + 10.0

    def test_search_topk_consistency(self, gem_small, rng):
        model, variables = gem_small
        g = rng.standard_normal((50, 64)).astype(np.float32)
        g = g / np.linalg.norm(g, axis=1, keepdims=True)
        q = g[:5] + 0.01
        scores, idx = search_topk(q, g, k=10)
        assert idx.shape == (5, 10)
        # top-1 of a near-copy query is the source row
        np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(5))
        # scores descending
        s = np.asarray(scores)
        assert np.all(np.diff(s, axis=1) <= 1e-6)
