"""Declarative config tree with per-model presets.

Replaces the reference's argparse + meta.yml + 16 launcher shell scripts
(reference: config/__init__.py:5-89, config/meta.yml, src/benchmark/*.sh):
every experiment is a (TrainConfig, model preset) pair; the CLI maps flags
onto these dataclasses.
"""

from __future__ import annotations

import dataclasses
from typing import Any

__all__ = ["TrainConfig", "EvalConfig", "PRESETS", "get_preset"]


@dataclasses.dataclass
class TrainConfig:
    """Training hyperparameters (defaults mirror config/__init__.py)."""

    model: str = "gem_r50"
    model_overrides: dict = dataclasses.field(default_factory=dict)

    # data
    data_root: str = ""
    csv_path: str = ""
    imsize: int = 512
    batch_size: int = 128
    num_workers: int = 8
    seed: int = 11
    val_per_class: int = 1
    # ship RAW uint8 batches and fuse (x/255 - mean)/std into the jitted
    # train/eval steps (4x fewer H2D bytes; the reference normalizes on
    # the host, configdataset.py:421-424).  Augmentation then runs in
    # uint8 space like the reference's PIL stack.  Disable for the BGR
    # (Caffe) path or to reproduce the float host pipeline exactly.
    raw_input: bool = True
    # synthetic-fallback dataset shape (used when no data_root is set;
    # the reference's rigorous harness trains 50 classes / 2000 samples
    # at 224px, manus/8_6and7 rigorous_training.py:34-70)
    synthetic_classes: int = 16
    synthetic_samples: int = 16  # train samples per class
    synthetic_val_samples: int = 4  # val samples per class
    # yield the synthetic fixture as RAW uint8 so the driver's fused-norm
    # uint8 path carries it (4x fewer tunnel bytes); off by default to
    # keep the float [0,1] distribution existing tests pin
    synthetic_uint8: bool = False

    # optimization (reference defaults: spca_train/config)
    optimizer: str = "sgd"  # or "adamw", "adamw_then_sgd" (ULTRON)
    base_lr: float = 0.01
    final_lr: float = 1e-6
    warmup_lr: float = 1e-6
    warmup_epochs: int = 1
    num_epochs: int = 100
    momentum: float = 0.9
    weight_decay: float = 1e-4
    clip_max_norm: float = 1.0
    update_every: int = 1  # gradient accumulation
    switch_epoch: int = 5  # optimizer hand-off epoch for adamw_then_sgd

    # parallelism
    data_parallel: int | None = None  # default: all devices
    model_parallel: int = 1

    # backbone compute dtype ("" = model default fp32; "bfloat16" is the
    # TPU answer to the reference's AMP fp16 path — losses/descriptors
    # stay fp32 inside every model)
    compute_dtype: str = ""

    # offline LLM-distillation teacher (data/teacher.TextTeacher): a
    # frozen text encoder runs ONCE on the host over one text per class;
    # the jitted step gathers teacher_table[labels] on-device as
    # text_features.  Only distillation models (sparse, hamlet) accept
    # it.  The reference instead runs DistilBERT inside every train
    # forward (manus/1_SPARSE/sparse_model.py:91-97).
    teacher: bool = False
    teacher_texts: str = ""  # one text per line, line i = class i; "" = synthetic template
    teacher_model: str = "distilbert-base-uncased"
    teacher_max_length: int = 64
    # opt-in for a RANDOM-INIT teacher when the hub cache misses — off by
    # default so a typo'd teacher_model hard-errors instead of silently
    # distilling noise (ADVICE r3)
    teacher_allow_random: bool = False

    # checkpointing / logging
    directory: str = "checkpoints"
    save_freq: int = 1
    keep_every: int = 5
    val_epoch: int = 1
    print_freq: int = 200
    resume: str | None = None
    # TensorBoard event files alongside JSONL (reference channel:
    # manus/6_iris/iris_train.py:487-488); needs the tensorboard package
    tensorboard: bool = False
    # redraw <directory>/curves.png every N epochs (0 disables) — the
    # reference's in-loop matplotlib dumps (spca_train.py:206-240), out
    # of the hot loop here (per-epoch, not per-10-iterations)
    plot_freq: int = 1


@dataclasses.dataclass
class EvalConfig:
    """Extraction + Revisited evaluation settings."""

    model: str = "gem_r50"
    model_overrides: dict = dataclasses.field(default_factory=dict)
    datasets: tuple = ("roxford5k", "rparis6k")
    data_root: str = ""
    imsize: int = 1024
    multiscale: tuple = (1.0,)  # or (1.0, 2**-0.5, 0.5)
    # resolution-bucket quantum for masked extraction: coarser buckets =
    # fewer XLA compiles, more padded compute.  128 with max-side-1024
    # thumbnails caps distinct buckets at ~8 per scale (the max side is
    # always exactly imsize, only the short side varies)
    bucket: int = 128
    # multi-scale bucketed extraction: resize on DEVICE via exact
    # per-image tap tables (index/extract._DeviceScaleStream) — one H2D
    # transfer per image instead of per scale, no host resize stage.
    # False restores per-scale host resizes (native C++/numpy).
    device_scales: bool = True
    # split JPEG decode: > 0 ships entropy-decoded DCT coefficients
    # (top-left k x k per block) and finishes decoding on device —
    # (k*k/64)*3 of the RGB wire bytes (ops/jpeg_decode.py).  Gallery
    # images only; bbox'd queries fall back to RGB per item.
    dct_decode: int = 0
    checkpoint: str | None = None
    kappas: tuple = (1, 5, 10)
    alpha_qe: bool = False
    qe_k: int = 10
    qe_alpha: float = 3.0
    # learned Iterative Query Expansion (index/qe.py, reference
    # manus/1_SPARSE/sparse_model.py:334-426): MLP-expanded queries,
    # blended scores, applied recursively
    iqe: bool = False
    iqe_k: int = 5
    iqe_iterations: int = 2
    iqe_gamma: float = 0.6
    iqe_checkpoint: str | None = None
    # SuperGlobal-style global-feature reranking (index/superglobal.py)
    superglobal: bool = False
    sg_m: int = 100  # shortlist size to refine
    # PCA whitening learned on the gallery descriptors (ops/whiten.py,
    # reference backbone.py:42-58); 0 keeps the native dimension
    pca_whiten: bool = False
    pca_dim: int = 0
    pca_shrinkage: float = 1.0
    # CVNet correlation-verification reranking of the top-k shortlist
    # (models/cvnet.py + index/rerank.py batched scorer)
    cvnet_rerank: bool = False
    rerank_k: int = 20
    rerank_blend: float = 0.5
    rerank_imsize: int = 224
    rerank_backbone: str = "resnet50"
    rerank_checkpoint: str | None = None
    # DELG local-feature geometric (affine-RANSAC) reranking: requires the
    # evaluated model to expose extract_local (the delg family)
    local_rerank: bool = False
    lr_top_attn: int = 128  # keep this many highest-attention locals


# Per-model experiment presets: the declarative replacement for the
# reference's *_training.sh launcher scripts.
PRESETS: dict[str, dict[str, Any]] = {
    "gem_r50": dict(
        model="gem_r50", optimizer="sgd", base_lr=0.01, num_epochs=100,
        model_overrides=dict(s=32.0, m=0.15),
    ),
    "gem_r101": dict(model="gem_r101", optimizer="sgd", base_lr=0.01),
    "token_r101": dict(
        model="token_r101", optimizer="sgd", base_lr=0.01,
    ),
    "spca_r101": dict(
        # reference spca_training_example.sh + config/meta.yml defaults
        model="spca_r101", optimizer="sgd", base_lr=0.01,
        model_overrides=dict(K=16, local_dim=128, multi=1, combine="cro",
                             outputdim=2048, s=45.0, m=0.2),
    ),
    "dolg_r101": dict(
        model="dolg_r101", optimizer="sgd", base_lr=0.01,
        model_overrides=dict(s=30.0, m=0.15),
    ),
    "solar_r101": dict(model="solar_r101", optimizer="sgd", base_lr=0.01),
    "delg_r50": dict(model="delg_r50", optimizer="adamw", base_lr=1e-3),
    "how_vlad_r50": dict(model="how_vlad_r50", optimizer="adamw", base_lr=1e-3),
    "how_asmk_r50": dict(model="how_asmk_r50", optimizer="adamw", base_lr=1e-3),
    "sosnet_r50": dict(model="sosnet_r50", optimizer="adamw", base_lr=1e-3),
    "spoc_r50": dict(model="spoc_r50", optimizer="sgd", base_lr=0.01),
    "senet_g2_r50": dict(model="senet_g2_r50", optimizer="sgd", base_lr=0.01),
    "ultron_s": dict(
        # ULTRON paper schedule: AdamW(1e-3) x5 -> SGD(1e-2 cosine) x35
        model="ultron_s", optimizer="adamw_then_sgd", base_lr=1e-3,
        num_epochs=40, switch_epoch=5, batch_size=128, imsize=512,
        clip_max_norm=1.0, weight_decay=0.05,
    ),
    "adaptive_hybrid_r50": dict(
        model="adaptive_hybrid_r50", optimizer="adamw", base_lr=1e-3,
        num_epochs=8,
    ),
    # distillation prototypes (P1/P2): pair with --teacher for the
    # offline LLM-distillation table (data/teacher.py)
    "sparse_r50": dict(
        model="sparse_r50", optimizer="adamw", base_lr=1e-3,
    ),
    "hamlet_r50": dict(
        model="hamlet_r50", optimizer="adamw", base_lr=1e-3,
    ),
}


def get_preset(name: str, **overrides) -> TrainConfig:
    """Build a TrainConfig from a preset name plus overrides."""
    if name not in PRESETS:
        raise KeyError(f"Unknown preset '{name}'. Available: {sorted(PRESETS)}")
    cfg = dict(PRESETS[name])
    model_overrides = {**cfg.pop("model_overrides", {}),
                       **overrides.pop("model_overrides", {})}
    return TrainConfig(model_overrides=model_overrides, **{**cfg, **overrides})
