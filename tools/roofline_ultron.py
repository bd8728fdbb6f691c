"""ULTRON-S train-step roofline decomposition (VERDICT r3 weak #3).

The round-3 zoo table measured ULTRON-S at 81.8 img/s for the full
fwd+bwd+opt step at the 512px/b32 operating point — 4.8x slower than the
convnets — with no stage-level analysis.  This tool produces the same
decomposition BENCH.md has for GeM-R50:

* per-stage fwd+bwd time by truncation differencing (``ULTRON.num_stages``
  runs only the first k stages; successive differences isolate each
  stage, the R50 method),
* XLA ``cost_analysis`` flops / bytes per truncated program -> cumulative
  MFU and HBM-bandwidth utilisation against v5e peaks,
* targeted experiments at the full operating point:
    - ``window_size=8``: SCALA's ws=7 does not divide the 32/16 token
      grids at 512px, so window partition pads 32->35 (+20% windows) and
      16->21 (+72%); ws=8 divides both exactly (different model:
      rel-pos table is 15x15 vs 13x13 — a TPU-tuned variant, not a
      drop-in),
    - ``use_context_keys=False``: removes the MCK depthwise branch from
      every SCALA block (costs the three dilated depthwise convs + fuse).

Run on the real chip from the repo root:

    python -u tools/roofline_ultron.py [--img 512] [--batch 32]

Prints one JSON line per measurement (reference operating point:
ultron_training_example.sh:8-23 — 4 GPUs, 512px, global batch 128).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from research_image_retrieval_tpu.models.ultron import (  # noqa: E402
    ULTRON,
    ULTRONRetrievalModel,
)
from research_image_retrieval_tpu.utils.benchtime import timed_slope  # noqa: E402
from research_image_retrieval_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache,
)

PEAK_FLOPS = 197e12  # v5e bf16
PEAK_BW = 819e9  # v5e HBM

CFGS = {
    "s": dict(embed_dims=(64, 128, 320, 512), depths=(3, 5, 9, 5),
              num_heads=(2, 4, 10, 16)),
    # plumbing sanity on CPU: one block per stage
    "tiny": dict(embed_dims=(16, 32, 48, 64), depths=(1, 1, 1, 1),
                 num_heads=(2, 2, 2, 4)),
}


def cost_of(jitted, *args):
    """(flops, bytes accessed) of the compiled program, or (0, 0) when the
    backend exposes no cost model."""
    try:
        c = jitted.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0] if c else {}
        return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))
    except Exception as e:  # noqa: BLE001 — cost model is best-effort
        print(f"  (cost_analysis unavailable: {e!r})", file=sys.stderr)
        return 0.0, 0.0


def bare_step(model, x):
    """Truncated-backbone train step: fwd + bwd of a scalar loss over all
    params (BN stats treated as constants — matches the R50 method)."""
    v0 = model.init(jax.random.PRNGKey(0), x, train=True)
    consts = {k: v for k, v in v0.items() if k != "params"}
    mutable = list(consts.keys())

    def step(params, xb):
        def loss_fn(p):
            out = model.apply({"params": p, **consts}, xb, train=True,
                              mutable=mutable)
            y = out[0] if isinstance(out, tuple) else out
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

        g = jax.grad(loss_fn)(params)
        return jax.tree.map(lambda a, b: a - 1e-3 * b.astype(a.dtype),
                            params, g)

    return step, v0["params"]


def full_step(model, x, labels):
    """Full retrieval-model train step (MadaCos loss, SGD update)."""
    v0 = model.init(jax.random.PRNGKey(0), x, labels, train=True)
    consts = {k: v for k, v in v0.items() if k != "params"}
    mutable = list(consts.keys())

    def step(params, xb, lb):
        def loss_fn(p):
            out = model.apply({"params": p, **consts}, xb, lb, train=True,
                              mutable=mutable)
            (loss, _logits) = out[0] if isinstance(out, tuple) else out
            return loss

        g = jax.grad(loss_fn)(params)
        return jax.tree.map(lambda a, b: a - 1e-3 * b.astype(a.dtype),
                            params, g)

    return step, v0["params"]


def measure(name: str, step, params, args, batch: int):
    jitted = jax.jit(step)
    flops, bytes_ = cost_of(jitted, params, *args)
    sec = timed_slope(step, params, args=args)
    rec = {
        "program": name,
        "ms": round(sec * 1e3, 2),
        "img_per_s": round(batch / sec, 1),
        "gflops": round(flops / 1e9, 1),
        "gbytes": round(bytes_ / 1e9, 2),
        "mfu_pct": round(100 * flops / sec / PEAK_FLOPS, 1) if flops else None,
        "bw_pct": round(100 * bytes_ / sec / PEAK_BW, 1) if bytes_ else None,
    }
    print(json.dumps(rec))
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--classes", type=int, default=81313)
    ap.add_argument("--cfg", choices=("s", "tiny"), default="s")
    ap.add_argument("--skip-experiments", action="store_true")
    args = ap.parse_args()

    enable_persistent_cache()
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((args.batch, args.img, args.img, 3)),
        jnp.bfloat16,
    )
    labels = jnp.asarray(rng.integers(0, args.classes, args.batch))

    # --- truncation ladder over the bare backbone ---
    rows = []
    cfg = CFGS[args.cfg]
    for k in range(1, 5):
        model = ULTRON(img_size=args.img, dtype=jnp.bfloat16,
                       num_stages=k, **cfg)
        step, params = bare_step(model, x)
        rows.append(measure(f"stages<={k} fwd+bwd", step, params, (x,),
                            args.batch))

    # --- full model (pooling + MadaCos head) ---
    model = ULTRONRetrievalModel(num_classes=args.classes,
                                 variant="s" if args.cfg == "s" else "t",
                                 img_size=args.img, dtype=jnp.bfloat16)
    step, params = full_step(model, x, labels)
    full = measure("full train step", step, params, (x, labels), args.batch)

    # --- per-stage differences ---
    prev = 0.0
    for k, r in enumerate(rows, 1):
        print(json.dumps({"stage": k, "stage_ms": round(r["ms"] - prev, 2)}))
        prev = r["ms"]
    print(json.dumps({"stage": "pool+madacos head",
                      "stage_ms": round(full["ms"] - prev, 2)}))

    if args.skip_experiments:
        return

    # --- experiments at the full operating point ---
    for name, kw in (
        ("ws=8 (grid-aligned windows)", dict(window_size=8)),
        ("no MCK (use_context_keys=False)", dict(use_context_keys=False)),
    ):
        model = ULTRONRetrievalModel(num_classes=args.classes,
                                     variant="s" if args.cfg == "s" else "t",
                                     img_size=args.img, dtype=jnp.bfloat16,
                                     **kw)
        step, params = full_step(model, x, labels)
        measure(f"full train step, {name}", step, params, (x, labels),
                args.batch)


if __name__ == "__main__":
    main()
