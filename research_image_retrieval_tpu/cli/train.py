"""Training CLI.

Replaces the reference's launcher scripts + argparse config
(reference: config/__init__.py:5-89, src/benchmark/*.sh):

    python -m research_image_retrieval_tpu.cli.train --preset gem_r50 \
        --data-root /data/gldv2 --csv-path /data/train_clean.csv

Without --data-root it trains on the deterministic synthetic fixture
(the reference's simulated-GLDv2 mode).
"""

from __future__ import annotations

import argparse
import dataclasses

from research_image_retrieval_tpu.utils.config import PRESETS, TrainConfig, get_preset


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native retrieval training")
    p.add_argument("--preset", default="gem_r50", choices=sorted(PRESETS),
                   help="model preset (replaces the reference's *_training.sh)")
    p.add_argument("--list-presets", action="store_true")
    # flag names mirror the reference argparse (config/__init__.py)
    p.add_argument("--data-root", default="", help="GLDv2 image root")
    p.add_argument("--csv-path", default="", help="train_clean.csv path")
    p.add_argument("--imsize", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--num-epochs", type=int, default=None)
    p.add_argument("--base-lr", type=float, default=None)
    p.add_argument("--final-lr", type=float, default=None)
    p.add_argument("--warmup-epochs", type=int, default=None)
    p.add_argument("--weight-decay", type=float, default=None)
    p.add_argument("--update-every", type=int, default=None,
                   help="gradient accumulation steps")
    p.add_argument("--clip-max-norm", type=float, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--directory", default=None, help="checkpoint directory")
    p.add_argument("--resume", default=None)
    p.add_argument("--save-freq", type=int, default=None)
    p.add_argument("--num-workers", type=int, default=None)
    p.add_argument("--data-parallel", type=int, default=None)
    p.add_argument("--model-parallel", type=int, default=None)
    p.add_argument("--dtype", dest="compute_dtype", default=None,
                   choices=("float32", "bfloat16"),
                   help="backbone compute dtype (the reference's AMP "
                        "analogue; losses/descriptors stay fp32)")
    p.add_argument("--host-norm", dest="raw_input", action="store_false",
                   default=None,
                   help="normalize inputs on the host (float32 batches) "
                        "instead of the default RAW-uint8 device-fused "
                        "path")
    p.add_argument("--teacher", action="store_true", default=None,
                   help="offline LLM-distillation teacher: encode one "
                        "text per class ONCE on the host, gather by label "
                        "in the jitted step (distillation models: sparse, "
                        "hamlet)")
    p.add_argument("--teacher-texts", default=None,
                   help="label-text file, one text per line (line i = "
                        "class i); default: synthetic 'a photo of "
                        "landmark i' templates")
    p.add_argument("--teacher-model", default=None,
                   help="hub name for the teacher encoder (default "
                        "distilbert-base-uncased; hard error when no "
                        "local weights exist unless "
                        "--teacher-allow-random)")
    p.add_argument("--teacher-allow-random", dest="teacher_allow_random",
                   action="store_true", default=None,
                   help="opt-in: fall back to a RANDOM-INIT teacher (+ "
                        "hashing tokenizer) when the hub cache has no "
                        "weights for --teacher-model — exercises the "
                        "distillation path but carries no semantics")
    p.add_argument("--max-steps-per-epoch", type=int, default=None,
                   help="debug: cap steps per epoch")
    return p


def config_from_args(args) -> TrainConfig:
    overrides = {}
    for field in dataclasses.fields(TrainConfig):
        key = field.name.replace("_", "-")
        val = getattr(args, field.name, None)
        if val is not None and key not in ("model", "model-overrides"):
            overrides[field.name] = val
    overrides.pop("model", None)
    overrides.pop("model_overrides", None)
    return get_preset(args.preset, **overrides)


def main(argv=None):
    args = build_parser().parse_args(argv)

    from research_image_retrieval_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    if args.list_presets:
        for name in sorted(PRESETS):
            print(name)
        return 0
    cfg = config_from_args(args)
    print(">> config:", cfg)
    from research_image_retrieval_tpu.train.driver import train

    train(cfg, max_steps_per_epoch=args.max_steps_per_epoch)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
