"""Sharded-vs-single-device training equivalence (the SyncBN theorem).

The reference trains with DDP + SyncBatchNorm (reference:
spca_train.py:138-139): gradients all-reduced, BN batch statistics
computed over the global batch.  Our claim is that jit-over-sharded-batch
(GSPMD) gives the *same semantics with no per-model knob* — batch-axis
reductions are global reductions, XLA inserts the collectives.

These tests make that a theorem rather than a vibe: one train step on the
8-device virtual CPU mesh must match a single-device step on the same
global batch to fp32 round-off — loss, grad norm, updated params, and
updated batch_stats.  A per-shard (unsynced) BN would blow the
batch_stats tolerance by orders of magnitude (per-shard means differ at
the batch-stat-variance level, ~1e-2 on random data).
"""

import jax
import numpy as np
import pytest

from research_image_retrieval_tpu.parallel import make_mesh
from research_image_retrieval_tpu.parallel.verify import (
    sharded_step_equivalence,
)

# fp32 round-off through two conv-net train steps: reduction order is the
# only difference between the two programs.  Empirically ~1e-6; pinned an
# order of magnitude above that, and 3+ orders below per-shard-BN error.
TOL = dict(loss=1e-4, grad_norm=5e-4, params=5e-5, batch_stats=5e-4)


@pytest.mark.parametrize("data,model", [(8, 1), (4, 2)])
def test_sharded_train_step_matches_single_device(data, model):
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    mesh = make_mesh(data=data, model=model)
    dev = sharded_step_equivalence(mesh, steps=2)
    assert np.isfinite(dev["loss_value"])
    for key, tol in TOL.items():
        assert dev[key] <= tol, (
            f"{key} deviates by {dev[key]:.3e} (> {tol:.0e}) on the "
            f"{data}x{model} mesh — sharded training is NOT equivalent "
            f"to single-device"
        )
