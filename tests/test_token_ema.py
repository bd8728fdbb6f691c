"""Token's ArcFace-DELG EMA buffer must thread through the train step."""

import numpy as np

import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.models import get_model
from research_image_retrieval_tpu.train import (
    create_train_state,
    make_eval_step,
    make_sgd_optimizer,
    make_train_step,
)


def test_ema_t_updates_through_train_step():
    # local deterministic rng: the shared session fixture makes this
    # test's data depend on suite ordering
    rng = np.random.default_rng(42)
    model = get_model("token_r50", backbone_name="resnet18", outputdim=64,
                      num_classes=8, use_delg_arcface=True)
    tx = make_sgd_optimizer(0.01)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray(np.array([1, 3]))
    state = create_train_state(model, jax.random.PRNGKey(0), x, y, tx)

    assert "arcface_t" in jax.tree_util.tree_flatten_with_path(
        state.model_state
    )[0][0][0][0].key or state.model_state  # collection exists
    t0 = float(jax.tree.leaves(state.model_state)[0][0])

    step = make_train_step(model, tx, donate=False)
    state, _ = step(state, x, y)
    t1 = float(jax.tree.leaves(state.model_state)[0][0])
    state, _ = step(state, x, y)
    t2 = float(jax.tree.leaves(state.model_state)[0][0])

    assert t0 == 0.0
    assert t1 != t0 and t2 != t0  # EMA moved away from the init value
    assert 0.0 < abs(t2) < 1.0

    # eval step consumes the state without error.  Let the BN running
    # stats converge first (momentum 0.9): eval-mode near-init stats leave
    # activations at ~1e9 in a deep untrained net, where XLA's fused
    # recomputation of the attention logits can overflow exp() — a
    # pathology of untrained-eval only, not of trained checkpoints.
    for _ in range(25):
        state, _ = step(state, x, y)
    ev = make_eval_step(model)
    m = ev(state, x, y)
    assert np.isfinite(float(m["loss"]))
