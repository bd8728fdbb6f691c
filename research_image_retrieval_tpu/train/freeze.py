"""Parameter freezing as optax masks (functional freeze_weights).

Replaces the reference's requires_grad mutation
(reference: utils/helpfunc.py:328-340 freeze_weights/unfreeze_weights and
networks/RetrievalNet.py:602-615 freeze_all_but_bn): in JAX, freezing is a
zero-update mask applied through optax.multi_transform / masked updates.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import optax

__all__ = ["freeze_mask", "freeze_all_but", "apply_freeze"]


def freeze_mask(params, frozen_submodules: Sequence[str]):
    """True where the leaf is trainable; False under any named submodule.

    ``frozen_submodules`` match any path component (e.g. ["backbone"]
    freezes the whole backbone, the reference's freeze_weights semantics).
    """
    frozen = set(frozen_submodules)

    def rule(path, _leaf) -> bool:
        names = {getattr(p, "key", getattr(p, "name", "")) for p in path}
        return not (names & frozen)

    return jax.tree_util.tree_map_with_path(rule, params)


def freeze_all_but(params, keep_patterns: Sequence[str]):
    """Trainable only where a path component matches ``keep_patterns``
    (e.g. ["bn1", "bn2", "bn3"] for the reference's freeze_all_but_bn)."""
    keep = set(keep_patterns)

    def rule(path, _leaf) -> bool:
        names = {getattr(p, "key", getattr(p, "name", "")) for p in path}
        return bool(names & keep)

    return jax.tree_util.tree_map_with_path(rule, params)


def apply_freeze(
    tx: optax.GradientTransformation,
    mask_fn: Callable,
) -> optax.GradientTransformation:
    """Wrap an optimizer so masked-out (False) leaves receive zero updates."""
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        lambda params: jax.tree.map(
            lambda t: "train" if t else "freeze", mask_fn(params)
        ),
    )
