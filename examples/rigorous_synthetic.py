"""Converged-quality benchmark on the rigorous synthetic harness.

Trains a model to convergence on the procedural synthetic retrieval
task shaped like the reference's rigorous harness — 50 classes, 224px,
~1500 train / 500 test samples, Adam(W) lr 1e-3 wd 1e-4 + cosine,
20 epochs (reference: manus/8_6and7_training_and_eval/
rigorous_training.py:34-70,272-506) — then evaluates retrieval quality
with BOTH protocols:

* the reference's protocol-exact leave-one-out metrics
  (rigorous_evaluation.py:124-173): every test sample queries the full
  test set, relevance = same class, SELF INCLUDED in the ranking with
  relevance 0 (the reference's own quirk — it is why the reference
  reports P@1 = 0.0; reproduced here for apples-to-apples comparison),
* the Revisited protocol (evaluation/revisited.py) with easy = same
  class and junk = {self}, i.e. the corrected self-excluded ranking.

Reference converged numbers to beat
(rigorous_evaluation_results.json:18-24, AdaptiveHybrid on CPU):
  test acc 98.0% | mAP 0.7857 | P@5 0.80 | P@10 0.90

Usage:  python examples/rigorous_synthetic.py [model ...]
        (default: gem_r50 adaptive_hybrid_r50)
Writes benchmarks/rigorous_synthetic_<model>.json.
"""

from __future__ import annotations

import faulthandler
import json
import os
import sys
import time

# long remote compiles on the bench rig look like hangs — dump stacks
# periodically so a stuck run is diagnosable from the log
faulthandler.dump_traceback_later(300, repeat=True)

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from research_image_retrieval_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache,
)

enable_persistent_cache()

_env = lambda k, d: int(os.environ.get(k, d))
NUM_CLASSES = _env("RIG_CLASSES", 50)
TEST_PER_CLASS = _env("RIG_TEST_PER_CLASS", 10)   # 500 test, like the ref
TRAIN_PER_CLASS = _env("RIG_TRAIN_PER_CLASS", 30)  # ~1500 train samples
IMSIZE = _env("RIG_IMSIZE", 224)
EPOCHS = _env("RIG_EPOCHS", 20)
BATCH = _env("RIG_BATCH", 32)
REFERENCE = {"test_accuracy": 98.0, "mAP": 0.7857, "P@1": 0.0,
             "P@5": 0.80, "P@10": 0.90}

# Per-model optimizer recipes.  The reference's Adam lr=1e-3 is tuned to
# its small CE-classifier wrappers; an ArcFace(s=32, m=0.15) head on a
# SCRATCH R50 is a different optimization problem — under Adam 1e-3 it
# diverges (observed: loss 11.9 -> 23 by epoch 5) and under SGD 0.01 it
# crawls (observed: 9.27 -> 8.28 over 5 epochs).  The production margin
# is tuned for 81k classes with a pretrained trunk; for the 50-class
# scratch harness GeM gets a softened head (s=16, m=0.05 — the standard
# small-dataset ArcFace regime) under AdamW, evaluated with the SAME
# overrides.  ``overrides`` entries merge into model_overrides.
RECIPES = {
    "gem_r50": dict(optimizer="adamw", base_lr=1e-3,
                    overrides=dict(s=16.0, m=0.05)),
    "adaptive_hybrid_r50": dict(optimizer="adamw", base_lr=3e-4),
}


def reference_protocol_metrics(feats: np.ndarray, labels: np.ndarray,
                               top_k=(1, 5, 10)) -> dict:
    """The reference's leave-one-out metrics, protocol-exact
    (rigorous_evaluation.py:124-173): self stays IN the ranking with
    relevance 0."""
    f = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    sim = f @ f.T
    n = len(f)
    aps, p_at = [], {k: [] for k in top_k}
    for i in range(n):
        rel = (labels == labels[i]).astype(np.float64)
        rel[i] = 0.0
        order = np.argsort(-sim[i])
        srel = rel[order]
        if srel.sum() > 0:
            cum = np.cumsum(srel)
            prec = cum / np.arange(1, n + 1)
            aps.append(float((prec * srel).sum() / srel.sum()))
        for k in top_k:
            p_at[k].append(float(srel[:k].sum() / k))
    return {"mAP": float(np.mean(aps)),
            **{f"P@{k}": float(np.mean(v)) for k, v in p_at.items()}}


def revisited_protocol_metrics(feats: np.ndarray,
                               labels: np.ndarray) -> dict:
    """Corrected (self-excluded via junk) Revisited-protocol numbers."""
    from research_image_retrieval_tpu.evaluation import evaluate_revisited

    f = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    sim = f @ f.T
    ranks = np.argsort(-sim.T, axis=0)  # [gallery, query] per protocol
    gnd = []
    for i in range(len(f)):
        same = np.flatnonzero(labels == labels[i])
        gnd.append({"easy": same[same != i], "hard": np.array([], int),
                    "junk": np.array([i])})
    res = evaluate_revisited(ranks, gnd, dataset="synthetic",
                             kappas=(1, 5, 10))
    return {"mAP": res.map_easy / 100.0,
            **{f"P@{k}": p / 100.0
               for k, p in zip((1, 5, 10), res.mp_easy)}}


def run(model_name: str) -> dict:
    from research_image_retrieval_tpu.data import SyntheticRetrievalDataset
    from research_image_retrieval_tpu.models import get_model
    from research_image_retrieval_tpu.train.driver import train
    from research_image_retrieval_tpu.utils.config import TrainConfig

    recipe = dict(RECIPES.get(model_name,
                              dict(optimizer="adamw", base_lr=3e-4)))
    overrides = recipe.pop("overrides", {})
    # keep only overrides the model's dataclass actually accepts (e.g.
    # ULTRON has no ``outputdim``; only margin heads have ``s``/``m``)
    import dataclasses

    fields = {f.name for f in dataclasses.fields(
        get_model(model_name, num_classes=NUM_CLASSES))}
    overrides = {
        k: v for k, v in dict(outputdim=512, **overrides).items()
        if k in fields
    }
    cfg = TrainConfig(
        model=model_name,
        model_overrides=overrides,
        imsize=IMSIZE,
        batch_size=BATCH,
        num_workers=2,
        final_lr=1e-5,
        weight_decay=1e-4,
        warmup_epochs=1,
        num_epochs=EPOCHS,
        **recipe,
        synthetic_classes=NUM_CLASSES,
        synthetic_samples=TRAIN_PER_CLASS,
        synthetic_val_samples=TEST_PER_CLASS,
        directory=f"/tmp/rigorous_{model_name}",
        print_freq=50,
        plot_freq=0,
        seed=11,
        # checkpoint only at the end: a full-state snapshot is a ~200 MB
        # D2H readback, which over the bench rig's remote tunnel costs
        # more than the epoch it checkpoints
        save_freq=EPOCHS,
        # RAW uint8 over the wire + device-fused (x/255-mean)/std — the
        # same path real datasets take, and 4x fewer bytes through the
        # slow remote-tunnel H2D on the bench rig
        synthetic_uint8=True,
    )
    t0 = time.time()
    state, history = train(cfg)
    train_s = time.time() - t0
    if history.get("preempted"):
        # the driver's preemption guard turns SIGTERM into
        # checkpoint-and-return — do NOT evaluate (or record) a
        # partially trained state as a converged result
        sys.exit(f"{model_name}: preempted after "
                 f"{len(history['train_loss'])}/{EPOCHS} epochs — aborting")

    # ---- test-set features + accuracy through the TRAINED state ----
    # HELD-OUT samples of the SAME classes: class signatures shared with
    # the train split (signature_seed), per-sample stream disjoint from
    # both train (seed) and the driver's val split (seed + 1)
    test_ds = SyntheticRetrievalDataset(
        num_classes=NUM_CLASSES, samples_per_class=TEST_PER_CLASS,
        image_size=IMSIZE, seed=cfg.seed + 2, uint8=True,
        signature_seed=cfg.seed,
    )
    model = get_model(model_name, num_classes=NUM_CLASSES,
                      **cfg.model_overrides)
    variables = {"params": state.params}
    if getattr(state, "batch_stats", None):
        variables["batch_stats"] = state.batch_stats

    from research_image_retrieval_tpu.data.transforms import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )
    from research_image_retrieval_tpu.ops import fused_input_norm

    norm = fused_input_norm((IMAGENET_MEAN, IMAGENET_STD))

    @jax.jit
    def extract(x):
        return model.apply(variables, norm(x), method="extract")

    @jax.jit
    def logits_of(x, labels):
        _, logits = model.apply(variables, norm(x), labels, train=False)
        return logits

    feats, correct, labels_all = [], 0, []
    B = TEST_PER_CLASS  # divides len(test_ds) exactly
    for i in range(0, len(test_ds), B):
        imgs = np.stack([test_ds[j][0] for j in range(i, i + B)])
        labels = np.asarray([test_ds[j][1] for j in range(i, i + B)])
        # the dataset yields RAW uint8 and training went through the
        # driver's fused-norm uint8 path — feed extraction the SAME
        # fused stage (ops/norm.py, the single definition)
        x = jnp.asarray(imgs)
        feats.append(np.asarray(extract(x)))
        lg = np.asarray(logits_of(x, jnp.asarray(labels)))
        correct += int((lg.argmax(-1) == labels).sum())
        labels_all.append(labels)
    feats = np.concatenate(feats)
    labels_all = np.concatenate(labels_all)
    acc = 100.0 * correct / len(test_ds)

    ref_metrics = reference_protocol_metrics(feats, labels_all)
    rev_metrics = revisited_protocol_metrics(feats, labels_all)
    out = {
        "model": model_name,
        "config": {"num_classes": NUM_CLASSES, "imsize": IMSIZE,
                   "train_per_class": TRAIN_PER_CLASS,
                   "test_samples": len(test_ds), "epochs": EPOCHS,
                   **recipe,
                   **({"model_overrides": overrides} if overrides else {})},
        "train_seconds": round(train_s, 1),
        "test_accuracy": round(acc, 2),
        "reference_protocol": {k: round(v, 4)
                               for k, v in ref_metrics.items()},
        "revisited_protocol_self_excluded": {
            k: round(v, 4) for k, v in rev_metrics.items()},
        "reference_converged_numbers": REFERENCE,
    }
    os.makedirs(os.path.join(ROOT, "benchmarks"), exist_ok=True)
    path = os.path.join(ROOT, "benchmarks",
                        f"rigorous_synthetic_{model_name}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    print(f"wrote {path}")
    return out


if __name__ == "__main__":
    models = sys.argv[1:] or ["gem_r50", "adaptive_hybrid_r50"]
    for m in models:
        run(m)
