"""Per-window variance of the four top-k engines in ONE run.

VERDICT r4 item 7: exact-bf16 measured 13.47 ms (r4) vs 11.77 (r3) vs a
tuned 10.6-12.7 claim — plausibly tunnel weather, but no single run ever
recorded all four engines across multiple load windows.  This tool does
exactly that: W windows, all engines interleaved inside each window
(so every window is a fair cross-engine comparison), gap seconds apart.

    python -u tools/bench_topk_windows.py [--windows 3] [--gap 60]

Prints one JSON line per (window, engine) plus a summary with
min/median/max per engine — the evidence base for the single-chip
default-engine decision in BENCH.md / docs/SERVING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from research_image_retrieval_tpu.ops import (  # noqa: E402
    approx_streaming_topk,
    int8_streaming_topk,
    quantize_gallery_int8,
    scan_streaming_topk,
)
from research_image_retrieval_tpu.utils.benchtime import timed_slope  # noqa: E402
from research_image_retrieval_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache,
)

N, D, Q, K = 1_400_000, 2048, 70, 100
CHUNK = 350_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--gap", type=float, default=60.0)
    args = ap.parse_args()
    enable_persistent_cache()

    @jax.jit
    def make_gallery(key):
        g = jax.random.normal(key, (N, D), jnp.bfloat16)
        n = jnp.linalg.norm(g.astype(jnp.float32), axis=1, keepdims=True)
        return (g.astype(jnp.float32) / n).astype(jnp.bfloat16)

    g = make_gallery(jax.random.PRNGKey(0))
    g.block_until_ready()
    q = jax.random.normal(jax.random.PRNGKey(1), (Q, D), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    qg, gscales = jax.jit(quantize_gallery_int8)(g)
    qg.block_until_ready()

    # galleries travel as timed_slope args, NEVER closures — closing a
    # 5.7 GB gallery into the jitted step serializes it as a lowering
    # constant (the compile-cache gotcha in .claude/skills/verify)
    engines = (
        ("exact",
         lambda q, g: scan_streaming_topk(q, g, k=K, chunk=CHUNK), (g,)),
        ("approx",
         lambda q, g: approx_streaming_topk(q, g, k=K), (g,)),
        ("int8_exact_sel",
         lambda q, qg, gs: int8_streaming_topk(q, qg, gs, k=K, chunk=CHUNK),
         (qg, gscales)),
        ("int8_approx_sel",
         lambda q, qg, gs: int8_streaming_topk(q, qg, gs, k=K, chunk=CHUNK,
                                               selection="approx"),
         (qg, gscales)),
    )

    def mk_step(fn):
        def step(x, *a):
            s, _ = fn(x, *a)
            return x + jnp.mean(s) * 1e-12
        return step

    for name, fn, fa in engines:  # warm every program before window 0
        timed_slope(mk_step(fn), q, n_small=1, n_large=2, args=fa)

    results: dict[str, list[float]] = {name: [] for name, _, _ in engines}
    for w in range(args.windows):
        if w:
            time.sleep(args.gap)
        for name, fn, fa in engines:
            sec = timed_slope(mk_step(fn), q, n_small=2, n_large=6, args=fa)
            ms = sec * 1e3
            results[name].append(ms)
            print(json.dumps({"window": w, "engine": name,
                              "ms": round(ms, 2)}), flush=True)
    summary = {
        name: {"min": round(min(v), 2),
               "median": round(float(np.median(v)), 2),
               "max": round(max(v), 2)}
        for name, v in results.items()
    }
    print(json.dumps({"summary": summary, "windows": args.windows,
                      "gap_s": args.gap, "shape": [N, D, Q, K]}),
          flush=True)


if __name__ == "__main__":
    main()
