"""Sanity tests for the in-graph slope timing harness."""

import numpy as np

import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.utils.benchtime import chain_perturb, timed_slope


def test_slope_positive_and_scales(rng):
    x = jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32))

    def small_step(a):
        return a @ a

    def big_step(a):
        y = a
        for _ in range(8):
            y = y @ a
        return y

    t_small = timed_slope(small_step, x, 2, 8)
    t_big = timed_slope(big_step, x, 2, 8)
    assert t_small > 0
    # 8 chained matmuls must measure meaningfully slower than one
    assert t_big > 2.0 * t_small, (t_small, t_big)


def test_args_passthrough_no_capture(rng):
    g = jnp.asarray(rng.standard_normal((128, 64)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    t = timed_slope(lambda qq, gg: qq @ gg.T, q, 2, 4, args=(g,))
    assert t > 0


def test_chain_perturb_preserves_structure(rng):
    x = {"a": jnp.ones((3,)), "b": jnp.zeros((2, 2))}
    out = jnp.asarray([1.0])
    y = chain_perturb(x, out)
    assert set(y) == {"a", "b"}
    assert y["a"].shape == (3,) and y["b"].shape == (2, 2)
