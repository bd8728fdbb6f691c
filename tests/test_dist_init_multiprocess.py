"""Real 2-process ``jax.distributed`` bootstrap smoke test.

Executes the multi-host seam that every other distributed test only
imports (reference seam: utils/helpfunc.py:151-171 —
``init_distributed_mode`` + NCCL rendezvous): two subprocesses on CPU
rendezvous through ``init_distributed_mode`` (RANK/WORLD_SIZE env path),
run one cross-process ``psum`` over the global 2-device mesh, search a
cross-process-sharded gallery (exact + int8 engines), run one
cross-process data-parallel TRAIN STEP asserting equivalence with the
single-device step on the same global batch (the DDP + SyncBatchNorm
semantics, spca_train.py:138-139, across a real process boundary), and
iterate one ``ShardedBatchIterator`` epoch with TRUE process sharding,
asserting the shards partition the dataset exactly.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["RIR_REPO"])

import jax
jax.config.update("jax_platforms", "cpu")

from research_image_retrieval_tpu.parallel import init_distributed_mode

ok = init_distributed_mode(quiet_non_main=False)
assert ok, "distributed env set but init returned False"
assert jax.process_count() == 2, jax.process_count()
rank = jax.process_index()

# one cross-process collective over the global 2-device mesh
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

mesh = Mesh(np.asarray(jax.devices()).reshape(2), axis_names=("data",))

import numpy as np  # noqa: E402  (worker namespace)

@jax.jit
def allsum(x):
    return jax.shard_map(
        lambda v: jax.lax.psum(v, "data"),
        mesh=mesh, in_specs=P("data"), out_specs=P(),
    )(x)

local = jnp.asarray([float(rank + 1)])
# global [2] array: each process contributes its local shard
arr = jax.make_array_from_process_local_data(
    jax.NamedSharding(mesh, P("data")), np.asarray(local, np.float32), (2,)
)
total = float(np.asarray(allsum(arr))[0])
assert total == 3.0, total  # 1 + 2 across processes

# cross-PROCESS sharded serving: the gallery lives half on each process
# (the DCN analogue of the ICI-sharded search), searched with both the
# exact and the int8 engine; the replicated merge must equal the local
# numpy reference in both processes
from research_image_retrieval_tpu.parallel import sharded_streaming_topk

rng = np.random.default_rng(11)  # same seed both processes
full = rng.standard_normal((32, 16)).astype(np.float32)
full /= np.linalg.norm(full, axis=1, keepdims=True)
queries = full[:3] + 0.01

gmesh = Mesh(np.asarray(jax.devices()).reshape(2, 1),
             axis_names=("data", "model"))
gallery = jax.make_array_from_process_local_data(
    jax.NamedSharding(gmesh, P("data", None)),
    full[rank * 16:(rank + 1) * 16], (32, 16),
)
from research_image_retrieval_tpu.ops import (
    int8_streaming_topk, quantize_gallery_int8,
)

refs = {"exact": np.argsort(-(queries @ full.T), axis=1)[:, :5]}
qg, gs = quantize_gallery_int8(full)  # local, single-device
refs["int8"] = np.asarray(
    int8_streaming_topk(queries, qg, gs, k=5, chunk=16)[1]
)
for engine, ref in refs.items():
    s, i = sharded_streaming_topk(queries, gallery, k=5, mesh=gmesh,
                                  chunk=8, engine=engine)
    got = np.asarray(i)
    assert (got == ref).all(), (engine, got, ref)
print(f"RANK{rank}_SEARCH_OK", flush=True)

# cross-PROCESS data-parallel TRAIN STEP (the reference's DDP +
# SyncBatchNorm seam, spca_train.py:138-139, across a REAL process
# boundary): each process contributes half the global batch; the GSPMD
# step must reproduce the single-device step on the same global batch
# (grads globally averaged, BN statistics over the GLOBAL batch).
# tests/test_multichip_equivalence.py proves this on a virtual 8-device
# mesh inside ONE process; this is the multi-host (DCN) analogue.
import optax
from research_image_retrieval_tpu.models import get_model
from research_image_retrieval_tpu.parallel import replicated
from research_image_retrieval_tpu.train import (
    create_train_state,
    make_sgd_optimizer,
    make_train_step,
    warmup_cosine_schedule,
)

model = get_model("gem_r50", backbone_name="resnet18", outputdim=32,
                  num_classes=32)
sched = warmup_cosine_schedule(1, 1e-3, 4, 0.1, 1e-2, iter_per_epoch=10)
tx = make_sgd_optimizer(sched, momentum=0.9, weight_decay=1e-4,
                        clip_max_norm=1.0)
trng = np.random.default_rng(7)  # same seed => same GLOBAL batch everywhere
images = trng.standard_normal((8, 24, 24, 3)).astype(np.float32)
labels = trng.integers(0, 32, 8).astype(np.int32)

tmesh = Mesh(np.asarray(jax.devices()).reshape(2, 1), ("data", "model"))
key = jax.random.PRNGKey(0)
state_m = create_train_state(model, key, images[:1], labels[:1], tx,
                             mesh=tmesh)
step_m = make_train_step(model, tx, mesh=tmesh, donate=False)
dsh = jax.NamedSharding(tmesh, P("data"))
gimg = jax.make_array_from_process_local_data(
    dsh, images[rank * 4:(rank + 1) * 4], images.shape)
glab = jax.make_array_from_process_local_data(
    dsh, labels[rank * 4:(rank + 1) * 4], labels.shape)
state_m, metrics_m = step_m(state_m, gimg, glab)

# single-device reference on the same GLOBAL batch, computed locally in
# each process (the classifier weight is mesh-sharded and not fully
# addressable, so state-wide comparisons go through jitted GLOBAL scalars)
state_s = create_train_state(model, key, images[:1], labels[:1], tx)
step_s = make_train_step(model, tx, donate=False)
state_s, metrics_s = step_s(state_s, images, labels)

norm_m = jax.jit(
    lambda s: optax.global_norm((s.params, s.batch_stats)),
    out_shardings=replicated(tmesh),
)(state_m)
norm_s = jax.jit(lambda s: optax.global_norm((s.params, s.batch_stats)))(
    state_s)
# grad_norm is a sum over every squared grad element — the one metric
# whose fp32 reduction ORDER differs between the GSPMD and single-device
# programs, so it gets a relative tolerance (measured ~3e-4 rel on CPU);
# loss and the post-update state norm stay absolute.
dev = {
    "loss": abs(float(metrics_m["loss"]) - float(metrics_s["loss"])),
    "grad_norm": abs(float(metrics_m["grad_norm"])
                     - float(metrics_s["grad_norm"]))
    / max(1.0, abs(float(metrics_s["grad_norm"]))),
    "state_norm": abs(float(norm_m) - float(norm_s)),
}
tol = {"loss": 1e-4, "grad_norm": 2e-3, "state_norm": 1e-4}
for name, d in dev.items():
    assert d < tol[name], (name, d, dev)
# BN batch statistics are replicated (readable) — the SyncBN claim proper
for pa, pb in zip(jax.tree.leaves(state_m.batch_stats),
                  jax.tree.leaves(state_s.batch_stats)):
    assert np.max(np.abs(np.asarray(pa) - np.asarray(pb))) < 1e-4
print(f"RANK{rank}_TRAIN_OK dev={dev}", flush=True)

# ShardedBatchIterator with true process sharding (defaults read the
# jax process topology)
from research_image_retrieval_tpu.data import ShardedBatchIterator

class Ds:
    def __len__(self):
        return 16
    def __getitem__(self, i):
        return np.full((2, 2, 3), i, np.float32), i

it = ShardedBatchIterator(Ds(), batch_size=4, shuffle=False, num_workers=0)
assert it.shard_index == rank and it.shard_count == 2
seen = []
for images, labels in it.epoch_batches():  # __iter__ is an endless stream
    seen.extend(int(l) for l in labels)
print(f"RANK{rank}_SEEN={sorted(seen)}", flush=True)
print(f"RANK{rank}_PSUM_OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_bootstrap(tmp_path):
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text("import numpy as np\n" + _WORKER)

    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # 1 local CPU device per process
        env.update(
            RIR_REPO=repo,
            RANK=str(rank),
            WORLD_SIZE="2",
            MASTER_ADDR="127.0.0.1",
            MASTER_PORT=str(port),
            JAX_PLATFORMS="cpu",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )

    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:  # never leave orphaned workers burning the core
            if p.poll() is None:
                p.kill()
                p.communicate()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank}_PSUM_OK" in out, out
        assert f"RANK{rank}_SEARCH_OK" in out, out
        assert f"RANK{rank}_TRAIN_OK" in out, out

    # the two shards must partition [0, 16) exactly: rank r takes the
    # strided slice starting at r (see ShardedBatchIterator)
    import re

    seen = {}
    for rank, out in enumerate(outs):
        m = re.search(rf"RANK{rank}_SEEN=\[([0-9, ]*)\]", out)
        assert m, out
        seen[rank] = [int(v) for v in m.group(1).split(",")]
    merged = sorted(seen[0] + seen[1])
    assert merged == list(range(16)), merged
    assert not set(seen[0]) & set(seen[1])


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port
