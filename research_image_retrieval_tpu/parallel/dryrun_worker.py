"""Multi-process dry-run worker: one rank of a 2-process virtual mesh.

Run as ``python -m research_image_retrieval_tpu.parallel.dryrun_worker``
with RANK / WORLD_SIZE / MASTER_ADDR / MASTER_PORT set and an
``XLA_FLAGS=--xla_force_host_platform_device_count=<local>`` CPU
backend.  Together the processes form a ``(world*local)``-device global
mesh spanning a REAL process boundary — the DCN analogue of the
single-process ICI dry run in ``__graft_entry__.dryrun_multichip``
(reference seam: utils/helpfunc.py:151-171 NCCL rendezvous + DDP/
SyncBatchNorm, spca_train.py:138-139).

Asserted per rank:

* one cross-process data-parallel + classifier-sharded TRAIN STEP equals
  the single-device step on the same global batch (loss / grad-norm /
  post-update state norm / replicated BN statistics),
* cross-process gallery-sharded streaming search (exact + int8) equals
  the local dense / single-device rankings.

Prints ``RANK<k>_DRYRUN_OK`` on success; the parent greps for it.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from research_image_retrieval_tpu.parallel import init_distributed_mode

    ok = init_distributed_mode(quiet_non_main=False)
    assert ok, "distributed env set but init returned False"
    world = jax.process_count()
    rank = jax.process_index()
    n_total = jax.device_count()
    local = n_total // world

    import jax.numpy as jnp  # noqa: F401
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from research_image_retrieval_tpu.models import get_model
    from research_image_retrieval_tpu.ops import (
        int8_streaming_topk,
        quantize_gallery_int8,
    )
    from research_image_retrieval_tpu.parallel import (
        replicated,
        sharded_streaming_topk,
    )
    from research_image_retrieval_tpu.train import (
        create_train_state,
        make_sgd_optimizer,
        make_train_step,
        warmup_cosine_schedule,
    )

    # mesh: data x model, classifier sharded ACROSS the process boundary
    model_par = 2 if n_total % 2 == 0 and n_total > 2 else 1
    mesh = Mesh(
        np.asarray(jax.devices()).reshape(n_total // model_par, model_par),
        ("data", "model"),
    )

    # ---- cross-process train step == single-device on the global batch
    model = get_model("gem_r50", backbone_name="resnet18", outputdim=32,
                      num_classes=32)
    sched = warmup_cosine_schedule(1, 1e-3, 4, 0.1, 1e-2, iter_per_epoch=10)
    tx = make_sgd_optimizer(sched, momentum=0.9, weight_decay=1e-4,
                            clip_max_norm=1.0)
    trng = np.random.default_rng(7)  # same seed -> same GLOBAL batch
    B = max(8, n_total)
    images = trng.standard_normal((B, 24, 24, 3)).astype(np.float32)
    labels = trng.integers(0, 32, B).astype(np.int32)

    key = jax.random.PRNGKey(0)
    state_m = create_train_state(model, key, images[:1], labels[:1], tx,
                                 mesh=mesh)
    step_m = make_train_step(model, tx, mesh=mesh, donate=False)
    dsh = NamedSharding(mesh, P("data"))
    half = B // world
    gimg = jax.make_array_from_process_local_data(
        dsh, images[rank * half:(rank + 1) * half], images.shape)
    glab = jax.make_array_from_process_local_data(
        dsh, labels[rank * half:(rank + 1) * half], labels.shape)
    state_m, metrics_m = step_m(state_m, gimg, glab)

    state_s = create_train_state(model, key, images[:1], labels[:1], tx)
    step_s = make_train_step(model, tx, donate=False)
    state_s, metrics_s = step_s(state_s, images, labels)

    norm_m = jax.jit(
        lambda s: optax.global_norm((s.params, s.batch_stats)),
        out_shardings=replicated(mesh),
    )(state_m)
    norm_s = jax.jit(
        lambda s: optax.global_norm((s.params, s.batch_stats)))(state_s)
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
    for pa, pb in zip(jax.tree.leaves(state_m.batch_stats),
                      jax.tree.leaves(state_s.batch_stats)):
        assert np.max(np.abs(np.asarray(pa) - np.asarray(pb))) < 1e-4

    # ---- cross-process gallery-sharded search (exact + int8)
    gmesh = Mesh(np.asarray(jax.devices()).reshape(n_total, 1),
                 ("data", "model"))
    rng = np.random.default_rng(11)
    N = 16 * n_total
    full = rng.standard_normal((N, 16)).astype(np.float32)
    full /= np.linalg.norm(full, axis=1, keepdims=True)
    queries = full[:3] + 0.01
    gallery = jax.make_array_from_process_local_data(
        NamedSharding(gmesh, P("data", None)),
        full[rank * (N // world):(rank + 1) * (N // world)], (N, 16),
    )
    refs = {"exact": np.argsort(-(queries @ full.T), axis=1)[:, :5]}
    qg, gs = quantize_gallery_int8(full)
    refs["int8"] = np.asarray(
        int8_streaming_topk(queries, qg, gs, k=5, chunk=N)[1])
    for engine, ref in refs.items():
        _, i = sharded_streaming_topk(queries, gallery, k=5, mesh=gmesh,
                                      chunk=8, engine=engine)
        assert (np.asarray(i) == ref).all(), (engine,)

    # ---- cross-process extract -> rank -> Revisited protocol eval:
    # the bucketed mesh-sharded extractor streams the SAME host images
    # from every process (its device_put scatters each process's
    # addressable shards of the global batch), and the protocol mAP must
    # equal the single-device pipeline's exactly
    from research_image_retrieval_tpu.data import SyntheticRetrievalDataset
    from research_image_retrieval_tpu.data.transforms import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )
    from research_image_retrieval_tpu.evaluation import evaluate_revisited
    from research_image_retrieval_tpu.index import extract_vectors, rank_full

    xmodel = get_model("gem_r50", backbone_name="resnet18", outputdim=32,
                       num_classes=8)
    xvars = xmodel.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3), jnp.float32),
        labels=jnp.zeros((1,), jnp.int32), train=False,
    )

    def extract(x, valid_hw):
        return xmodel.apply(xvars, x, valid_hw, method="extract")

    ds = SyntheticRetrievalDataset(num_classes=4, samples_per_class=3,
                                   image_size=64, seed=3, uint8=True)
    imgs = [np.ascontiguousarray(ds[i][0][: 64 - 8 * (i % 3),
                                          : 64 - 8 * ((i + 1) % 3)])
            for i in range(len(ds))]
    xlabels = ds.labels
    kw = dict(scales=(1.0, 0.5), bucket=32, batch_size=4,
              device_scales=True,
              input_norm=(IMAGENET_MEAN, IMAGENET_STD))
    ref_v = extract_vectors(extract, imgs, **kw)
    got_v = extract_vectors(extract, imgs, mesh=mesh, **kw)
    xdev = float(np.abs(ref_v - got_v).max())
    assert xdev < 1e-5, f"cross-process extraction deviates {xdev:.3e}"
    gnd = []
    for i in range(len(imgs)):
        same = np.flatnonzero(xlabels == xlabels[i])
        gnd.append({"easy": same[same != i], "hard": np.array([], int),
                    "junk": np.array([i])})
    res_ref = evaluate_revisited(np.asarray(rank_full(ref_v, ref_v)), gnd,
                                 dataset="dryrun")
    res_got = evaluate_revisited(np.asarray(rank_full(got_v, got_v)), gnd,
                                 dataset="dryrun")
    assert res_ref.map_easy == res_got.map_easy, (res_ref, res_got)

    print(
        f"RANK{rank}_DRYRUN_OK world={world} local={local} "
        f"mesh={dict(mesh.shape)} loss={float(metrics_m['loss']):.4f} "
        f"dev={ {k: f'{v:.2e}' for k, v in dev.items()} } "
        f"extract_eval_dev={xdev:.1e} mAP={res_got.map_easy}",
        flush=True,
    )


if __name__ == "__main__":
    sys.exit(main())
