"""Tests for the inventory gap-fill: distractor dataset, dist init helpers,
curve plotting, CLIP dual tower."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.data import SyntheticRetrievalDataset
from research_image_retrieval_tpu.data.distractor import (
    DistractorDataset,
    partition_for_host,
)
from research_image_retrieval_tpu.models.clip import CLIP, clip_contrastive_loss
from research_image_retrieval_tpu.parallel.dist_init import (
    get_rank,
    get_world_size,
    init_distributed_mode,
    is_main_process,
)
from research_image_retrieval_tpu.train.plots import plot_curves, plot_from_jsonl


class TestDistractor:
    def test_partitioning_covers_pool(self):
        src = SyntheticRetrievalDataset(num_classes=3, samples_per_class=7,
                                        image_size=16)
        total = 0
        for host in range(4):
            part = partition_for_host(len(src), host, 4)
            ds = DistractorDataset(src, partition=part, imsize=12)
            total += len(ds)
            if len(ds):
                img = ds[0]
                assert max(img.shape[:2]) == 12
        assert total == len(src)

    def test_pool_subset(self):
        src = SyntheticRetrievalDataset(num_classes=2, samples_per_class=4,
                                        image_size=16)
        ds = DistractorDataset(src, pool=[1, 3, 5])
        assert len(ds) == 3
        np.testing.assert_array_equal(ds[1], np.asarray(src[3][0]))


class TestDistInit:
    def test_single_process_mode(self, capsys):
        # no env vars set -> returns False like the reference
        assert init_distributed_mode() is False
        assert "Not using distributed mode" in capsys.readouterr().out
        assert get_rank() == 0 and get_world_size() == 1
        assert is_main_process()


class TestPlots:
    def test_plot_curves(self, tmp_path):
        out = plot_curves(
            {"loss": [3.0, 2.0, 1.5], "lr": [0.1, 0.09, 0.08]},
            str(tmp_path / "curves.png"),
        )
        assert os.path.exists(out) and os.path.getsize(out) > 1000

    def test_plot_from_jsonl(self, tmp_path):
        p = tmp_path / "m.jsonl"
        p.write_text(
            '{"step": 1, "loss": 2.0}\n{"step": 2, "loss": 1.0}\n'
        )
        out = plot_from_jsonl(str(p), str(tmp_path / "j.png"))
        assert os.path.exists(out)


class TestCLIP:
    @pytest.fixture(scope="class")
    def model(self):
        m = CLIP(visual_variant="test", embed_dim=32, vocab_size=128,
                 context_length=16, text_dim=32, text_depth=2, text_heads=2,
                 img_size=32)
        imgs = jnp.zeros((2, 32, 32, 3))
        toks = jnp.ones((2, 16), jnp.int32)
        variables = m.init(jax.random.PRNGKey(0), imgs, toks)
        return m, variables

    def test_contrastive_forward(self, model, rng):
        m, variables = model
        imgs = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
        toks = jnp.asarray(rng.integers(1, 128, (4, 16)).astype(np.int32))
        loss, (im, tx) = m.apply(variables, imgs, toks)
        assert np.isfinite(float(loss))
        assert im.shape == (4, 32) and tx.shape == (4, 32)

    def test_extract_descriptor(self, model, rng):
        m, variables = model
        imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
        d = m.apply(variables, imgs, method="extract")
        np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=1), 1.0,
                                   rtol=1e-5)

    def test_aligned_batch_has_lower_loss(self, rng):
        """Perfectly aligned features -> lower loss than shuffled."""
        f = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
        aligned = clip_contrastive_loss(f, f, 10.0)
        shuffled = clip_contrastive_loss(f, f[::-1], 10.0)
        assert float(aligned) < float(shuffled)
