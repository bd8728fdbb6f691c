"""pjit train loop: model-agnostic train/eval steps over a device mesh.

Replaces the reference's DDP epoch loop (reference: spca_train.py:180-300):
gradient all-reduce, SyncBatchNorm stat exchange and loss-meter reduction
all fall out of jit-over-sharded-batch; the 81313-way classifier weight is
sharded over the mesh (see parallel.mesh) instead of replicated.

Works single-device too (mesh=None) — same code path, trivial mesh.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from research_image_retrieval_tpu.ops import fused_input_norm, topk_errors
from research_image_retrieval_tpu.parallel.mesh import (
    data_sharding,
    replicated,
    shard_train_state_rules,
)

__all__ = ["TrainState", "create_train_state", "make_train_step", "make_eval_step"]


class TrainState(flax.struct.PyTreeNode):
    """Single pytree holding everything a resumable train step needs."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # dropout/drop-path RNG key, split every step (resume-exact)
    rng: Any = None
    # extra mutable model state (e.g. ArcFace-DELG EMA t) — optional pytree
    model_state: Any = None


def create_train_state(
    model,
    rng,
    sample_images,
    sample_labels,
    optimizer: optax.GradientTransformation,
    mesh=None,
) -> TrainState:
    """Initialize variables + optimizer state, placed per sharding rules."""
    init_rng, train_rng = jax.random.split(rng)
    variables = model.init(
        init_rng, sample_images, labels=sample_labels, train=False
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        rng=train_rng,
        model_state=variables.get("model_state", {}),
    )
    if mesh is not None:
        rule = shard_train_state_rules(mesh)
        shardings = jax.tree_util.tree_map_with_path(rule, state)
        state = jax.tree.map(
            lambda x, s: jax.device_put(x, s), state, shardings
        )
    return state


# the fused RAW-uint8 input stage (shared with index/extract.py and the
# driver's probe — one definition, ops/norm.py): the step then takes
# uint8 batches and computes (x/255 - mean)/std inside the jitted
# program (the reference normalizes on the host inside
# ToTensor+Normalize, configdataset.py:421-424);
# tests/test_raw_train_input.py pins prep and step-update equivalence
_input_prep = fused_input_norm


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    mesh=None,
    donate: bool = True,
    input_norm=None,
    teacher_table=None,
) -> Callable:
    """Build the jitted train step: (state, images, labels) -> (state, metrics).

    With a mesh, the batch is sharded over the 'data' axis and the state
    follows its placement shardings; XLA inserts the gradient all-reduce.
    ``input_norm=(mean, std)`` fuses RAW-uint8 input normalization into
    the step (see ``_input_prep``).  ``teacher_table`` is an optional
    ``[num_classes, text_dim]`` array of frozen teacher embeddings
    (``data/teacher.TextTeacher.class_table``); the step gathers
    ``teacher_table[labels]`` on-device and passes it to the model as
    ``text_features`` — the distillation teacher costs one gather in the
    hot loop instead of the reference's per-batch host-side DistilBERT
    forward (``sparse_model.py:91-97``).
    """
    prep = _input_prep(input_norm)
    table = None if teacher_table is None else jnp.asarray(teacher_table)

    def loss_fn(params, batch_stats, model_state, images, labels, dropout_rng):
        variables = {"params": params, "batch_stats": batch_stats}
        if model_state is not None:
            variables["model_state"] = model_state
        kwargs = {}
        if table is not None:
            kwargs["text_features"] = jnp.take(table, labels, axis=0)
        (loss, logits), mutated = model.apply(
            variables, images, labels=labels, train=True,
            mutable=["batch_stats", "model_state"],
            rngs={"dropout": dropout_rng}, **kwargs,
        )
        return loss, (logits, mutated["batch_stats"],
                      mutated.get("model_state", None))

    def step_fn(state: TrainState, images, labels):
        images = prep(images)
        rng = state.rng if state.rng is not None else jax.random.PRNGKey(0)
        new_rng, dropout_rng = jax.random.split(rng)
        (loss, (logits, new_stats, new_model_state)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, state.model_state,
                images, labels, dropout_rng,
            )
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        e1, e5 = topk_errors(logits, labels, ks=(1, 5))
        metrics = {
            "loss": loss,
            "top1_err": e1,
            "top5_err": e5,
            "grad_norm": optax.global_norm(grads),
        }
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            rng=new_rng,
            model_state=(
                new_model_state if new_model_state else state.model_state
            ),
        )
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    dsh = data_sharding(mesh)
    rep = replicated(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(None, dsh, dsh),  # state keeps its placement shardings
        out_shardings=(None, rep),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, mesh=None, input_norm=None,
                   teacher_table=None) -> Callable:
    """Jitted validation step: (state, images, labels) -> metrics.

    ``teacher_table`` as in ``make_train_step`` — keeps the validation
    loss comparable to the training loss when distillation is on.
    """
    prep = _input_prep(input_norm)
    table = None if teacher_table is None else jnp.asarray(teacher_table)

    def step_fn(state: TrainState, images, labels):
        images = prep(images)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if state.model_state:
            variables["model_state"] = state.model_state
        kwargs = {}
        if table is not None:
            kwargs["text_features"] = jnp.take(table, labels, axis=0)
        loss, logits = model.apply(variables, images, labels=labels,
                                   train=False, **kwargs)
        e1, e5 = topk_errors(logits, labels, ks=(1, 5))
        return {"loss": loss, "top1_err": e1, "top5_err": e5}

    if mesh is None:
        return jax.jit(step_fn)
    dsh = data_sharding(mesh)
    return jax.jit(step_fn, in_shardings=(None, dsh, dsh),
                   out_shardings=replicated(mesh))
