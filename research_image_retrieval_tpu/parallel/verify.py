"""Multi-chip training correctness as a checkable theorem.

The framework's distributed-training claim (PARITY.md section 2.3) is that
jit-over-sharded-batch (GSPMD) reproduces the reference's DDP +
SyncBatchNorm semantics (reference: spca_train.py:138-139): gradients are
globally averaged and BN batch statistics are computed over the *global*
batch.  ``sharded_step_equivalence`` turns that claim into numbers — it
runs the same global batch through ``make_train_step`` once on an n-device
mesh and once on a single device, and reports the maximum deviations of
loss / metrics / updated params / updated batch_stats.

Used by tests/test_multichip_equivalence.py (pins the tolerance) and by
``__graft_entry__.dryrun_multichip`` (asserts it on every driver run).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

__all__ = ["sharded_step_equivalence"]


def _tree_max_abs_diff(a: Any, b: Any) -> float:
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    assert len(leaves_a) == len(leaves_b), "pytree structure mismatch"
    worst = 0.0
    for la, lb in zip(leaves_a, leaves_b):
        la = np.asarray(la, np.float64)
        lb = np.asarray(lb, np.float64)
        worst = max(worst, float(np.max(np.abs(la - lb))) if la.size else 0.0)
    return worst


def sharded_step_equivalence(
    mesh,
    model_name: str = "gem_r50",
    backbone_name: str = "resnet18",
    steps: int = 2,
    batch_size: int = 8,
    imsize: int = 32,
    num_classes: int = 64,
    seed: int = 0,
) -> dict:
    """Run ``steps`` train steps sharded over ``mesh`` vs single-device.

    Same model, same init rng, same global batches on both sides.  Returns
    the max absolute deviations::

        {"loss": .., "grad_norm": .., "params": .., "batch_stats": ..,
         "loss_value": ..}

    Under GSPMD the two programs are semantically identical (global-array
    semantics); only floating-point reduction order differs, so the
    deviations should sit at fp32 round-off (~1e-6 relative), NOT at
    per-shard-BN levels (which would be O(batch-stat variance), ~1e-2).
    """
    from research_image_retrieval_tpu.models import get_model
    from research_image_retrieval_tpu.train import (
        create_train_state,
        make_sgd_optimizer,
        make_train_step,
        warmup_cosine_schedule,
    )

    model = get_model(
        model_name,
        backbone_name=backbone_name,
        outputdim=num_classes,
        num_classes=num_classes,
    )
    sched = warmup_cosine_schedule(1, 1e-3, 4, 0.1, 1e-2, iter_per_epoch=10)
    tx = make_sgd_optimizer(sched, momentum=0.9, weight_decay=1e-4,
                            clip_max_norm=1.0)

    rng = np.random.default_rng(seed)
    batches = [
        (
            np.asarray(
                rng.standard_normal((batch_size, imsize, imsize, 3)),
                np.float32,
            ),
            np.asarray(rng.integers(0, num_classes, batch_size), np.int32),
        )
        for _ in range(steps)
    ]

    key = jax.random.PRNGKey(seed)
    state_m = create_train_state(model, key, batches[0][0], batches[0][1],
                                 tx, mesh=mesh)
    state_s = create_train_state(model, key, batches[0][0], batches[0][1],
                                 tx, mesh=None)
    step_m = make_train_step(model, tx, mesh=mesh, donate=False)
    step_s = make_train_step(model, tx, mesh=None, donate=False)

    metrics_m = metrics_s = None
    for images, labels in batches:
        state_m, metrics_m = step_m(state_m, images, labels)
        state_s, metrics_s = step_s(state_s, images, labels)

    return {
        "loss": abs(float(metrics_m["loss"]) - float(metrics_s["loss"])),
        "grad_norm": abs(
            float(metrics_m["grad_norm"]) - float(metrics_s["grad_norm"])
        ),
        "params": _tree_max_abs_diff(state_m.params, state_s.params),
        "batch_stats": _tree_max_abs_diff(
            state_m.batch_stats, state_s.batch_stats
        ),
        "loss_value": float(metrics_s["loss"]),
    }
