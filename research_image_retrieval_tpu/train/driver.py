"""End-to-end training driver: the reference trainers as one function.

Covers the flows of spca_train.main, multi_model_train*, and
ultron_training (reference: spca_train.py:68-305,
legacy_modules/multi_model_train.py:266-723, ultron_training.py:104-388):
registry-driven model dispatch, per-family optimizers including the ULTRON
AdamW -> SGD hand-off at ``switch_epoch``, warmup-cosine per-iteration LR,
gradient accumulation and clipping, per-epoch validation with top-1/5
errors, rolling checkpoints with best tracking, JSONL metrics, and exact
resume (model + optimizer + data-iterator state).

Falls back to the synthetic procedural dataset when no data_root is
configured (the reference's simulated-GLDv2 mode, ultron_training.py:25-67).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from research_image_retrieval_tpu.data import (
    ShardedBatchIterator,
    SyntheticRetrievalDataset,
    TrainTransform,
    EvalTransform,
    build_gldv2_train_val,
)
from research_image_retrieval_tpu.models import get_model
from research_image_retrieval_tpu.parallel import make_mesh
from research_image_retrieval_tpu.train.checkpoint import CheckpointManager
from research_image_retrieval_tpu.train.loop import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from research_image_retrieval_tpu.train.metrics import (
    DeferredUpdate,
    JsonlWriter,
    MetricLogger,
    TensorBoardWriter,
)
from research_image_retrieval_tpu.train.preemption import PreemptionGuard
from research_image_retrieval_tpu.train.optimizer import (
    make_adamw_optimizer,
    make_sgd_optimizer,
)
from research_image_retrieval_tpu.train.schedule import warmup_cosine_schedule
from research_image_retrieval_tpu.utils.config import TrainConfig

__all__ = ["train", "build_datasets", "build_optimizer", "build_teacher_table"]


def build_teacher_table(cfg: TrainConfig, model, num_classes: int):
    """``[num_classes, text_dim]`` frozen teacher embeddings for the
    distillation models (SPARSE/HAMLET take ``text_features``).

    The teacher (data/teacher.TextTeacher) runs ONCE on the host; the
    jitted step gathers rows by label on-device.  The reference runs a
    DistilBERT forward inside every training step instead
    (manus/1_SPARSE/sparse_model.py:91-97).
    """
    import inspect

    from research_image_retrieval_tpu.data.teacher import (
        TextTeacher,
        default_label_texts,
        load_label_texts,
    )

    if "text_features" not in inspect.signature(model.__call__).parameters:
        raise ValueError(
            f"--teacher set but model {cfg.model!r} takes no text_features; "
            "distillation models: sparse, hamlet")
    texts = (load_label_texts(cfg.teacher_texts, num_classes)
             if cfg.teacher_texts else default_label_texts(num_classes))
    teacher = TextTeacher(cfg.teacher_model,
                          max_length=cfg.teacher_max_length,
                          allow_random_init=cfg.teacher_allow_random)
    table = teacher.class_table(texts)
    want = getattr(model, "text_dim", None)
    if want is not None and table.shape[1] != want:
        raise ValueError(
            f"teacher text_dim {table.shape[1]} != model text_dim {want}; "
            f"set model_overrides text_dim={table.shape[1]} or pick a "
            "matching teacher")
    print(f">> teacher table: {table.shape[0]} classes x {table.shape[1]} "
          f"dims ({'pretrained' if teacher.pretrained else 'random-init'} "
          f"{cfg.teacher_model})")
    return table


def build_datasets(cfg: TrainConfig):
    """GLDv2 datasets when configured, synthetic fixture otherwise.

    A ``data_root`` pointing at a packed record file (``.rirrec`` — see
    data/records.py, the native replacement for the reference's LMDB path)
    loads through the mmap reader with a seeded per-class train/val split
    mirroring ``random_select`` (reference configdataset.py:366-388).
    """
    raw = bool(getattr(cfg, "raw_input", True))
    if cfg.data_root and cfg.data_root.endswith(".rirrec"):
        from research_image_retrieval_tpu.data import RecordDataset, RecordReader

        labels = RecordReader(cfg.data_root).labels()
        n_cls = int(labels.max()) + 1
        rng = np.random.default_rng(cfg.seed)
        val_idx = []
        for c in range(n_cls):
            members = np.flatnonzero(labels == c)
            take = min(cfg.val_per_class, max(len(members) - 1, 0))
            if take:
                val_idx.extend(rng.choice(members, take, replace=False))
        val_mask = np.zeros(len(labels), bool)
        val_mask[np.asarray(val_idx, int)] = True
        train = RecordDataset(
            cfg.data_root, indices=np.flatnonzero(~val_mask),
            transform=TrainTransform(cfg.imsize, seed=cfg.seed,
                                     raw_uint8=raw),
        )
        val = RecordDataset(
            cfg.data_root, indices=np.flatnonzero(val_mask),
            transform=EvalTransform(cfg.imsize, raw_uint8=raw),
        )
        return train, val, n_cls
    if cfg.data_root and cfg.csv_path:
        return build_gldv2_train_val(
            cfg.data_root,
            cfg.csv_path,
            val_per_class=cfg.val_per_class,
            seed=cfg.seed,
            train_transform=TrainTransform(cfg.imsize, seed=cfg.seed,
                                           raw_uint8=raw),
            val_transform=EvalTransform(cfg.imsize, raw_uint8=raw),
        )
    # synthetic fallback: deterministic procedural classes
    n_cls = cfg.synthetic_classes
    u8 = bool(getattr(cfg, "synthetic_uint8", False))
    # val shares the CLASS signatures with train (signature_seed) and
    # differs only in the per-sample stream (seed + 1) — held-out
    # samples of the SAME classes, the reference's split semantics
    # (rigorous_training.py:60-99)
    train = SyntheticRetrievalDataset(
        num_classes=n_cls, samples_per_class=cfg.synthetic_samples,
        image_size=cfg.imsize, seed=cfg.seed, uint8=u8,
    )
    val = SyntheticRetrievalDataset(
        num_classes=n_cls, samples_per_class=cfg.synthetic_val_samples,
        image_size=cfg.imsize, seed=cfg.seed + 1, uint8=u8,
        signature_seed=cfg.seed,
    )
    return train, val, n_cls


def build_optimizer(cfg: TrainConfig, iter_per_epoch: int, phase: str = "main"):
    """Optimizer(+schedule) for a training phase.

    ``adamw_then_sgd`` (ULTRON, reference legacy multi_model_train.py:524)
    uses AdamW at constant base_lr until switch_epoch, then SGD with a
    cosine schedule for the remaining epochs.
    """
    if cfg.optimizer == "adamw_then_sgd":
        if phase == "warm":
            return make_adamw_optimizer(
                cfg.base_lr, weight_decay=cfg.weight_decay,
                clip_max_norm=cfg.clip_max_norm, update_every=cfg.update_every,
            )
        sched = warmup_cosine_schedule(
            0, cfg.base_lr, cfg.num_epochs - cfg.switch_epoch, 1e-2,
            cfg.final_lr, iter_per_epoch,
        )
        return make_sgd_optimizer(
            sched, momentum=cfg.momentum, weight_decay=cfg.weight_decay,
            clip_max_norm=cfg.clip_max_norm, update_every=cfg.update_every,
        )
    sched = warmup_cosine_schedule(
        cfg.warmup_epochs,
        cfg.warmup_lr * cfg.update_every,
        cfg.num_epochs,
        cfg.base_lr * cfg.update_every,
        cfg.final_lr * cfg.update_every,
        max(iter_per_epoch // cfg.update_every, 1),
    )
    if cfg.optimizer == "adamw":
        return make_adamw_optimizer(
            sched, weight_decay=cfg.weight_decay,
            clip_max_norm=cfg.clip_max_norm, update_every=cfg.update_every,
        )
    return make_sgd_optimizer(
        sched, momentum=cfg.momentum, weight_decay=cfg.weight_decay,
        clip_max_norm=cfg.clip_max_norm, update_every=cfg.update_every,
    )


def train(cfg: TrainConfig, max_steps_per_epoch: int | None = None):
    """Run the full training loop; returns (state, history)."""
    train_ds, val_ds, num_classes = build_datasets(cfg)
    model_kwargs = dict(cfg.model_overrides)
    compute_dtype = cfg.compute_dtype
    if not compute_dtype and jax.devices()[0].platform in ("tpu", "axon"):
        # TPU-first default: bf16 backbone compute (the reference trains
        # under AMP; every model keeps losses/descriptors fp32).  Pass
        # --dtype float32 to force full precision.
        compute_dtype = "bfloat16"
        print("compute dtype: bfloat16 (TPU default; --dtype float32 to "
              "override)")
    if compute_dtype in ("", "float32"):
        compute_dtype = ""
    if compute_dtype and "dtype" not in model_kwargs:
        # bf16 backbone compute (the reference's AMP analogue) for models
        # that expose the knob; an explicit model_overrides dtype wins
        from research_image_retrieval_tpu.models.registry import (
            MODEL_REGISTRY,
        )

        cls = MODEL_REGISTRY[cfg.model].builder
        if dataclasses.is_dataclass(cls) and any(
            f.name == "dtype" for f in dataclasses.fields(cls)
        ):
            model_kwargs["dtype"] = jnp.dtype(compute_dtype)
        else:
            print(f"note: {cfg.model} has no compute-dtype knob; "
                  f"ignoring compute_dtype={compute_dtype}")
    model = get_model(cfg.model, num_classes=num_classes, **model_kwargs)

    teacher_table = (
        build_teacher_table(cfg, model, num_classes)
        if getattr(cfg, "teacher", False) else None
    )

    mesh = make_mesh(data=cfg.data_parallel, model=cfg.model_parallel)
    train_it = ShardedBatchIterator(
        train_ds, cfg.batch_size, seed=cfg.seed, num_workers=cfg.num_workers
    )
    val_it = ShardedBatchIterator(
        val_ds, cfg.batch_size, seed=cfg.seed, shuffle=False,
        num_workers=cfg.num_workers,
    )
    ipe = train_it.steps_per_epoch()
    if max_steps_per_epoch:
        ipe = min(ipe, max_steps_per_epoch)

    os.makedirs(cfg.directory, exist_ok=True)
    mgr = CheckpointManager(cfg.directory, keep_every=cfg.keep_every)
    jsonl = JsonlWriter(os.path.join(cfg.directory, "metrics.jsonl"))
    tb = (
        TensorBoardWriter(os.path.join(cfg.directory, "tb"))
        if getattr(cfg, "tensorboard", False) else None
    )

    def write_metrics(step: int, **metrics):
        jsonl.write(step, **metrics)
        if tb is not None:
            tb.write(step, **metrics)

    def close_writers():
        jsonl.close()
        if tb is not None:
            tb.close()

    # resolve the resume target FIRST: the optimizer phase (and therefore
    # the opt_state structure the restore template needs) depends on the
    # epoch being resumed (adamw_then_sgd hand-off)
    resume_mgr, resume_epoch = None, None
    if cfg.resume:
        if isinstance(cfg.resume, str) and cfg.resume not in ("latest", "true"):
            base = os.path.basename(os.path.normpath(cfg.resume))
            if not base.startswith("epoch_"):
                raise ValueError(
                    f"--resume expects 'latest' or a .../epoch_NNNNN path, "
                    f"got {cfg.resume!r}"
                )
            resume_epoch = int(base.split("_")[1])
            resume_mgr = CheckpointManager(
                os.path.dirname(os.path.abspath(cfg.resume)),
                keep_every=cfg.keep_every,
            )
        else:
            resume_mgr = mgr
            resume_epoch = mgr.latest_epoch()
            if resume_epoch is None:
                raise FileNotFoundError(f"no checkpoints in {cfg.directory}")

    def phase_for(epoch: int) -> str:
        if cfg.optimizer != "adamw_then_sgd":
            return "main"
        return "warm" if epoch < cfg.switch_epoch else "main"

    sample_imgs, sample_labels = next(iter(train_it.epoch_batches()))
    train_it.epoch, train_it.step = 0, 0  # rewind the probe batch

    # RAW uint8 batches (TrainTransform(raw_uint8=True), the default for
    # real datasets): ship uint8 and fuse (x/255 - mean)/std into the
    # jitted steps — 4x fewer H2D bytes, no host float math.  Detected
    # from the probe batch so any uint8-yielding dataset gets it.
    input_norm = None
    if np.asarray(sample_imgs).dtype == np.uint8:
        from research_image_retrieval_tpu.data.transforms import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )

        from research_image_retrieval_tpu.ops import fused_input_norm

        input_norm = (IMAGENET_MEAN, IMAGENET_STD)
        print(">> raw uint8 input: normalization fused into the train step")
        # init traces with normalized floats, through the SAME fused
        # stage the steps compile (ops/norm.py — no drift)
        sample_imgs = np.asarray(
            fused_input_norm(input_norm)(jnp.asarray(sample_imgs))
        )

    def fresh_state(tx_):
        return create_train_state(
            model, jax.random.PRNGKey(cfg.seed), jnp.asarray(sample_imgs),
            jnp.asarray(sample_labels), tx_, mesh=mesh,
        )

    def snapshot():
        """Checkpoint payload: model/optimizer state + data-iterator state
        + the loop epoch to resume at (exact resume incl. mid-epoch)."""
        # one bulk device_get (parallel D2H) — tree_map(np.asarray, ...)
        # fetches leaf-by-leaf, which serializes ~300 round-trips through
        # the remote tunnel and was measured dominating short epochs
        host_state = jax.device_get(state)
        return {
            "state": host_state,
            # 0-d arrays: orbax's standard handler rejects bare numpy scalars
            "it": {
                k: np.asarray(v, np.int64)
                for k, v in train_it.state_dict().items()
            },
            "loop_epoch": np.asarray(train_it.epoch, np.int64),
        }

    start_epoch = 0
    if resume_mgr is None:
        phase = phase_for(0)
        tx = build_optimizer(cfg, ipe, phase)
        state = fresh_state(tx)
    else:
        # the checkpoint's opt_state structure depends on the optimizer
        # phase it was SAVED under (warm vs main around the hand-off
        # boundary), which the checkpoint key alone cannot disambiguate —
        # try each phase's template
        phases = (
            ("warm", "main") if cfg.optimizer == "adamw_then_sgd" else ("main",)
        )
        restored = None
        last_err = None
        for ph in phases:
            tx_try = build_optimizer(cfg, ipe, ph)
            state_try = fresh_state(tx_try)
            template = {
                "state": jax.tree.map(np.asarray, state_try),
                "it": {
                    k: np.asarray(v, np.int64)
                    for k, v in train_it.state_dict().items()
                },
                "loop_epoch": np.asarray(0, np.int64),
            }
            try:
                restored, ep = resume_mgr.restore(template, epoch=resume_epoch)
                tx, state, phase = tx_try, state_try, ph
                break
            except Exception as e:  # structure mismatch -> other phase
                last_err = e
        if restored is None:
            raise last_err
        state = jax.tree.map(jnp.asarray, restored["state"])
        train_it.load_state_dict(
            {k: int(v) for k, v in restored["it"].items()}
        )
        start_epoch = int(restored["loop_epoch"])
        print(f">> resumed from checkpoint {ep} (optimizer phase '{phase}') "
              f"at loop epoch {start_epoch}, data step {train_it.step}")

    train_step = make_train_step(model, tx, mesh=mesh, donate=False,
                                 input_norm=input_norm,
                                 teacher_table=teacher_table)
    eval_step = make_eval_step(model, mesh=mesh, input_norm=input_norm,
                               teacher_table=teacher_table)

    # "preempted" is the explicit signal callers should use to detect a
    # partial run (epoch-count heuristics break on resume, where history
    # starts empty even though earlier epochs completed)
    history = {"train_loss": [], "val_loss": [], "val_top1_err": [],
               "preempted": False}
    switched = phase == "main"
    guard = PreemptionGuard()  # SIGTERM -> checkpoint and exit cleanly

    for epoch in range(start_epoch, cfg.num_epochs):
        # ULTRON optimizer hand-off
        if (
            cfg.optimizer == "adamw_then_sgd"
            and not switched
            and epoch >= cfg.switch_epoch
        ):
            tx = build_optimizer(cfg, ipe, "main")
            state = state.replace(opt_state=tx.init(state.params), step=state.step * 0)
            train_step = make_train_step(model, tx, mesh=mesh, donate=False,
                                         input_norm=input_norm,
                                         teacher_table=teacher_table)
            switched = True
            print(f">> optimizer hand-off to SGD at epoch {epoch}")

        logger = MetricLogger()
        # deferred readback: float()-ing this step's device metrics would
        # block until it finishes, serializing input decode with compute;
        # reading them one step late lets decode overlap the chip
        dlog = DeferredUpdate(logger)
        header = f">> Train Epoch: [{epoch}]"
        for i, (imgs, labels) in enumerate(
            logger.log_every(train_it.epoch_batches(), cfg.print_freq, header)
        ):
            state, m = train_step(state, jnp.asarray(imgs), jnp.asarray(labels))
            dlog.update(loss=m["loss"], top1_err=m["top1_err"],
                        top5_err=m["top5_err"])
            if guard.should_stop:
                # mid-epoch snapshot: iterator state makes resume exact
                mgr.save(epoch + 1, snapshot())
                print(f">> preemption checkpoint at epoch {epoch}, "
                      f"step {int(state.step)} (data step {train_it.step}); "
                      "exiting")
                guard.restore()
                close_writers()
                history["preempted"] = True
                return state, history
            if max_steps_per_epoch and i + 1 >= max_steps_per_epoch:
                train_it.epoch += 1
                train_it.step = 0
                break
        dlog.flush()  # deliver the final step's metrics
        history["train_loss"].append(logger.meters["loss"].avg)
        write_metrics(int(state.step), epoch=epoch,
                      train_loss=logger.meters["loss"].avg)

        if (epoch + 1) % cfg.val_epoch == 0:
            vlog = MetricLogger()
            dvlog = DeferredUpdate(vlog)
            for j, (imgs, labels) in enumerate(val_it.epoch_batches()):
                m = eval_step(state, jnp.asarray(imgs), jnp.asarray(labels))
                dvlog.update(loss=m["loss"], top1_err=m["top1_err"])
                if max_steps_per_epoch and j + 1 >= max_steps_per_epoch:
                    val_it.epoch += 1
                    val_it.step = 0
                    break
            dvlog.flush()
            history["val_loss"].append(vlog.meters["loss"].avg)
            history["val_top1_err"].append(vlog.meters["top1_err"].avg)
            print(f">> Val Epoch: [{epoch}] {vlog}")
            val_metric = vlog.meters["top1_err"].avg
        else:
            val_metric = None

        if (epoch + 1) % cfg.save_freq == 0:
            mgr.save(epoch + 1, snapshot(), metric=val_metric)

        if cfg.plot_freq and (epoch + 1) % cfg.plot_freq == 0:
            try:
                from research_image_retrieval_tpu.train.plots import (
                    plot_curves,
                )

                plot_curves(
                    history, os.path.join(cfg.directory, "curves.png"),
                    title=f"{cfg.model} training",
                )
            except Exception as e:  # matplotlib is an optional channel
                print(f">> curve plotting unavailable: {e}")
                cfg = dataclasses.replace(cfg, plot_freq=0)

    close_writers()
    return state, history
