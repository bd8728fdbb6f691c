"""Real 2-process ``jax.distributed`` bootstrap smoke test.

Executes the multi-host seam that every other distributed test only
imports (reference seam: utils/helpfunc.py:151-171 —
``init_distributed_mode`` + NCCL rendezvous): two subprocesses on CPU
rendezvous through ``init_distributed_mode`` (RANK/WORLD_SIZE env path),
run one cross-process ``psum`` over the global 2-device mesh, and iterate
one ``ShardedBatchIterator`` epoch with TRUE process sharding, asserting
the shards partition the dataset exactly.
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
            out, _ = p.communicate(timeout=300)
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
