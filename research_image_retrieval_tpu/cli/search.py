"""Serving CLI: top-k search over a saved descriptor index.

Completes the extract -> index -> search loop on the command line
(reference pattern: iris_evaluate.py:383-386 dense matmul + argsort; here
the streaming engines of ops/topk_stream.py).

    python -m research_image_retrieval_tpu.cli.search \
        --gallery gallery.npz --queries queries.npz --topk 10 \
        [--engine exact|approx|int8] [--alpha-qe] --output results.json

Engines: ``exact`` (grouped bit-exact stream, the default), ``approx``
(``lax.approx_max_k``), ``int8`` (symmetric per-row quantized gallery —
half the HBM stream bytes; see ops/topk_stream.py).  A gallery written
by ``rir-extract --quantize-int8`` (``vecs_int8`` + ``scales``) is
searched with the int8 engine by default, no quantization pass needed;
other engines (or --alpha-qe) dequantize it in memory.
"""

from __future__ import annotations

import argparse
import json


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="top-k descriptor search")
    p.add_argument("--gallery", required=True, help=".npz from rir-extract")
    p.add_argument("--queries", required=True, help=".npz from rir-extract")
    p.add_argument("--topk", type=int, default=100)
    p.add_argument("--engine", choices=("exact", "approx", "int8"),
                   default=None,
                   help="top-k engine (default exact; int8 = quantized "
                        "gallery serving path)")
    p.add_argument("--approx", action="store_true",
                   help="alias for --engine approx (kept for back-compat)")
    p.add_argument("--alpha-qe", action="store_true")
    p.add_argument("--qe-k", type=int, default=10)
    p.add_argument("--qe-alpha", type=float, default=3.0)
    p.add_argument("--output", default=None, help="write results JSON here")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from research_image_retrieval_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    import numpy as np

    from research_image_retrieval_tpu.index import alpha_query_expansion
    from research_image_retrieval_tpu.ops import (
        int8_streaming_topk,
        quantize_gallery_int8,
        streaming_topk,
    )

    gal = np.load(args.gallery, allow_pickle=False)
    qry = np.load(args.queries, allow_pickle=False)
    if "vecs" in qry:
        qvecs = qry["vecs"]
    elif "vecs_int8" in qry:
        # queries extracted with --quantize-int8: the engines quantize
        # queries on the fly anyway, so just dequantize to floats
        qvecs = qry["vecs_int8"].astype(np.float32) * qry["scales"][:, None]
    else:
        raise SystemExit(f"{args.queries} has neither 'vecs' nor "
                         f"'vecs_int8' (keys: {sorted(qry.keys())})")

    # a prequantized index (rir-extract --quantize-int8) stores
    # vecs_int8 + scales instead of vecs; default to the int8 engine
    # and only dequantize when another engine (or QE) needs floats.
    # an explicit engine request (--engine or the --approx alias)
    # always wins over the stored layout.
    prequantized = "vecs_int8" in gal
    engine = args.engine or ("approx" if args.approx else
                             ("int8" if prequantized else "exact"))
    qg = gscales = gvecs = None
    if prequantized:
        qg, gscales = gal["vecs_int8"], gal["scales"]
        n_gal = len(qg)
        if engine != "int8" or args.alpha_qe:
            gvecs = qg.astype(np.float32) * gscales[:, None]
            if engine != "int8":
                print(f"note: {args.gallery} is int8; dequantizing for "
                      f"--engine {engine}")
    else:
        gvecs = gal["vecs"]
        n_gal = len(gvecs)
        if args.engine is None and not args.approx:
            print("note: float gallery -> --engine exact (bf16 stream); "
                  "for production serving, extract with --quantize-int8 "
                  "so the int8 engine (fastest in every measured load "
                  "window, docs/SERVING.md) becomes the default")
    gnames = gal["names"] if "names" in gal else np.arange(n_gal)

    if args.alpha_qe:
        qvecs = np.asarray(
            alpha_query_expansion(qvecs, gvecs, k=args.qe_k,
                                  alpha=args.qe_alpha)
        )

    k = min(args.topk, n_gal)
    if engine == "int8":
        if qg is None:
            qg, gscales = quantize_gallery_int8(gvecs)
        scores, idx = int8_streaming_topk(qvecs, qg, gscales, k=k)
    else:
        scores, idx = streaming_topk(qvecs, gvecs, k=k,
                                     exact=engine == "exact")
    scores, idx = np.asarray(scores), np.asarray(idx)

    results = []
    qnames = qry["names"] if "names" in qry else np.arange(len(qvecs))
    for qi in range(len(qvecs)):
        results.append({
            "query": str(qnames[qi]),
            "matches": [
                {"name": str(gnames[j]), "score": float(s)}
                for j, s in zip(idx[qi], scores[qi])
            ],
        })
        top = results[-1]["matches"][0]
        print(f"{results[-1]['query']}: {top['name']} ({top['score']:.4f}) "
              f"+ {k - 1} more")
    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {len(results)} result lists -> {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
