"""Tests for freeze masks, profiling helpers, and the config presets."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from research_image_retrieval_tpu.train.freeze import (
    apply_freeze,
    freeze_all_but,
    freeze_mask,
)
from research_image_retrieval_tpu.utils import get_preset, PRESETS
from research_image_retrieval_tpu.utils.profiling import nan_check, step_timer


class TestFreeze:
    def _params(self):
        return {
            "backbone": {"conv1": {"kernel": jnp.ones((3, 3))}},
            "whiten": {"kernel": jnp.ones((2, 2)), "bias": jnp.zeros(2)},
        }

    def test_freeze_mask(self):
        m = freeze_mask(self._params(), ["backbone"])
        assert not m["backbone"]["conv1"]["kernel"]
        assert m["whiten"]["kernel"]

    def test_freeze_all_but(self):
        m = freeze_all_but(self._params(), ["whiten"])
        assert not m["backbone"]["conv1"]["kernel"]
        assert m["whiten"]["bias"]

    def test_apply_freeze_zeroes_updates(self):
        params = self._params()
        tx = apply_freeze(optax.sgd(1.0), lambda p: freeze_mask(p, ["backbone"]))
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        np.testing.assert_allclose(
            np.asarray(updates["backbone"]["conv1"]["kernel"]), 0.0
        )
        assert float(jnp.abs(updates["whiten"]["kernel"]).sum()) > 0


class TestProfiling:
    def test_step_timer(self):
        with step_timer() as t:
            x = t.sync(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
        assert t.ms is not None and t.ms >= 0
        assert float(x[0, 0]) == 8.0

    def test_nan_check_raises(self):
        def bad(x):
            return jnp.log(x)  # -inf at 0

        checked = jax.jit(nan_check(bad))
        with pytest.raises(Exception):
            np.asarray(checked(jnp.zeros((2,))))

    def test_nan_check_passes_clean(self):
        checked = nan_check(lambda x: x * 2)
        np.testing.assert_allclose(np.asarray(checked(jnp.ones(3))), 2.0)

    def test_nan_check_disabled(self):
        f = nan_check(lambda x: jnp.log(x), enabled=False)
        assert not np.isfinite(float(f(jnp.zeros(()))))


class TestPresets:
    def test_all_presets_build(self):
        for name in PRESETS:
            cfg = get_preset(name)
            assert cfg.model

    def test_override(self):
        cfg = get_preset("gem_r50", num_epochs=3,
                         model_overrides={"outputdim": 64})
        assert cfg.num_epochs == 3
        assert cfg.model_overrides["outputdim"] == 64
        assert cfg.model_overrides["s"] == 32.0  # preset default kept

    def test_unknown_preset(self):
        with pytest.raises(KeyError, match="Unknown preset"):
            get_preset("nope")
