"""Device mesh and sharding helpers.

The framework's parallelism model (SURVEY.md section 2.3):

* ``data`` axis — batch sharding (the reference's only strategy, DDP).
* ``model`` axis — shards the GLDv2-scale ArcFace classifier weight
  (81313 x D, ~0.67 GB fp32) column-wise across devices; XLA inserts the
  psum for the cross-entropy logsumexp automatically under GSPMD.

Gradient all-reduce, BN-stat sync (global-batch GSPMD semantics), and meter reductions
all come out of jit + shardings — no explicit process groups (the
reference's init_distributed_mode / SyncBatchNorm / DDP wrapper trio).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "classifier_sharding",
    "shard_train_state_rules",
]


def make_mesh(
    data: int | None = None,
    model: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults to all devices on the data axis (pure DP, the reference's
    setup); pass ``model>1`` to dedicate devices to classifier sharding.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _classifier_axis(mesh: Mesh) -> str:
    return "model" if mesh.shape["model"] > 1 else "data"


def classifier_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a [num_classes, D] classifier weight over the FEATURE dim.

    The GLDv2 head is 81313 x 2048 (~0.67 GB fp32): sharding it — and,
    via placement propagation, its gradient and optimizer moments —
    column-wise keeps it off any single chip.  The feature dim is the
    shardable one because explicit JAX shardings require even
    divisibility: D (512/1024/2048 across the zoo) divides every
    practical axis size, while the class count (81313) divides none —
    a class-dim P(axis, None) spec raises at ``device_put`` for the real
    GLDv2 head.  Logits stay batch-sharded either way; under GSPMD the
    D-partial dot products psum automatically.

    Uses the model axis when present (>1), otherwise the data axis.
    """
    return NamedSharding(mesh, P(None, _classifier_axis(mesh)))


def shard_train_state_rules(mesh: Mesh, classifier_key: str = "classifier_w"):
    """Pytree-path -> sharding rule for train state: classifier weight
    sharded, everything else replicated.

    Falls back to replicated when the feature dim does not divide the
    axis (tiny debug heads) — sharding is an optimization, never a
    constraint on the model.
    """
    cls_s = classifier_sharding(mesh)
    rep = replicated(mesh)
    n = mesh.shape[_classifier_axis(mesh)]

    def rule(path, leaf) -> NamedSharding:
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if (classifier_key in names and getattr(leaf, "ndim", 0) >= 2
                and leaf.shape[-1] % n == 0):
            return cls_s
        return rep

    return rule
