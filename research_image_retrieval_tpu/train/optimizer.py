"""Optimizers with the reference's weight-decay masking and accumulation.

Reproduces the reference optimizer semantics
(reference: utils/helpfunc.py:87-109 add_weight_decay + spca_train.py:132):
SGD with nesterov momentum, L2 weight decay added to the gradient (torch
style, before momentum), with 1-D params (biases, BN scales) excluded from
decay.  Gradient accumulation (``--update-every``) maps to
``optax.MultiSteps``; clipping is global-norm on raw grads.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax

__all__ = ["weight_decay_mask", "make_sgd_optimizer", "make_adamw_optimizer"]


def weight_decay_mask(params) -> dict:
    """True where decay applies: excludes any rank<=1 leaf (bias/BN/scalar).

    Same rule as the reference's add_weight_decay
    (helpfunc.py:105: ``len(param.shape) == 1 or name.endswith('.bias')``).
    """
    return jax.tree.map(lambda p: p.ndim > 1, params)


def _wrap(
    tx: optax.GradientTransformation,
    clip_max_norm: float,
    update_every: int,
) -> optax.GradientTransformation:
    parts = []
    if clip_max_norm and clip_max_norm > 0:
        parts.append(optax.clip_by_global_norm(clip_max_norm))
    parts.append(tx)
    out = optax.chain(*parts)
    if update_every and update_every > 1:
        out = optax.MultiSteps(out, every_k_schedule=update_every)
    return out


def make_sgd_optimizer(
    learning_rate: float | Callable,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    nesterov: bool = True,
    clip_max_norm: float = 0.0,
    update_every: int = 1,
) -> optax.GradientTransformation:
    """torch-style SGD: grad += wd*param, then (nesterov) momentum, then lr."""
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay, mask=weight_decay_mask),
        optax.sgd(learning_rate=learning_rate, momentum=momentum, nesterov=nesterov),
    )
    return _wrap(tx, clip_max_norm, update_every)


def make_adamw_optimizer(
    learning_rate: float | Callable,
    weight_decay: float = 0.05,
    b1: float = 0.9,
    b2: float = 0.999,
    clip_max_norm: float = 0.0,
    update_every: int = 1,
) -> optax.GradientTransformation:
    """AdamW with decoupled decay (ULTRON phase-1 optimizer)."""
    tx = optax.adamw(
        learning_rate=learning_rate,
        b1=b1,
        b2=b2,
        weight_decay=weight_decay,
        mask=weight_decay_mask,
    )
    return _wrap(tx, clip_max_norm, update_every)
