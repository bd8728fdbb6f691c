"""Learning-rate schedules.

``warmup_cosine_schedule`` reproduces the reference's WarmupCos_Scheduler
math exactly (reference: spca_train.py:38-65): linear warmup from
``warmup_lr`` to ``base_lr`` over ``warmup_epochs`` (np.linspace semantics —
endpoint included), then cosine decay
``final + 0.5*(base-final)*(1 + cos(pi * i / decay_iters))``.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["warmup_cosine_schedule"]


def warmup_cosine_schedule(
    warmup_epochs: int,
    warmup_lr: float,
    num_epochs: int,
    base_lr: float,
    final_lr: float,
    iter_per_epoch: int,
):
    """Per-iteration LR schedule function ``step -> lr`` (optax-compatible)."""
    warmup_iters = iter_per_epoch * warmup_epochs
    decay_iters = iter_per_epoch * (num_epochs - warmup_epochs)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_iters > 1:
            warm = warmup_lr + (base_lr - warmup_lr) * step / (warmup_iters - 1)
        else:
            warm = jnp.asarray(base_lr, jnp.float32)
        i = jnp.clip(step - warmup_iters, 0, max(decay_iters - 1, 1))
        cos = final_lr + 0.5 * (base_lr - final_lr) * (
            1.0 + jnp.cos(jnp.pi * i / max(decay_iters, 1))
        )
        return jnp.where(step < warmup_iters, warm, cos)

    return schedule
