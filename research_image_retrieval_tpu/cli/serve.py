"""Serving daemon: HTTP top-k search over a saved descriptor index.

The production completion of the extract -> index -> search loop
(reference's closest analogue: the AdaptiveHybrid prototype's in-process
gallery, adaptive_hybrid_retrieval_complete.py:347-433 — never exposed
as a service):

    rir-serve --gallery index.npz --port 8080 [--engine int8] \
        [--model gem_r50 --checkpoint ckpt --imsize 1024]

Then:

    curl localhost:8080/healthz
    curl -X POST localhost:8080/search \
        -d '{"vectors": [[...]], "k": 10}'
    curl -X POST localhost:8080/search/image \
        -d '{"image_b64": "<jpeg base64>", "k": 10}'

Queries arriving concurrently are micro-batched into single engine
calls (serve/service.py); engines and batch buckets are compiled up
front with --warmup so no request pays a compile.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="HTTP top-k search daemon")
    p.add_argument("--gallery", required=True, help=".npz from rir-extract")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--engine", choices=("exact", "approx", "int8"),
                   default=None,
                   help="top-k engine (default: int8 for a prequantized "
                        "index, exact otherwise)")
    p.add_argument("--topk", type=int, default=100,
                   help="server-wide max k (requests may ask for less)")
    p.add_argument("--max-batch", type=int, default=32,
                   help="largest coalesced query batch (rounded up to a "
                        "power of two)")
    p.add_argument("--window-ms", type=float, default=2.0,
                   help="micro-batching window after the first query")
    p.add_argument("--store-dtype", default="bfloat16",
                   choices=("bfloat16", "float32"),
                   help="device gallery dtype for the float engines")
    p.add_argument("--exact-fp32-scores", action="store_true",
                   help="score the exact engine at Precision.HIGHEST")
    p.add_argument("--selection", choices=("exact", "approx"),
                   default="exact", help="int8 engine selector")
    p.add_argument("--sharded", action="store_true",
                   help="shard the gallery row-wise over ALL local devices "
                        "(ICI-sharded serving: per-shard streams + [Q, k] "
                        "candidate merge; engines exact/int8)")
    p.add_argument("--no-warmup", action="store_true",
                   help="skip compiling all query buckets at startup")
    p.add_argument("--verbose", action="store_true",
                   help="log each HTTP request")
    # image-search endpoint (optional)
    p.add_argument("--model", default=None,
                   help="enable POST /search/image with this registry model")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--imsize", type=int, default=1024)
    p.add_argument("--multiscale", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from research_image_retrieval_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    from research_image_retrieval_tpu.serve import (
        ImageExtractor,
        SearchService,
        make_http_server,
    )

    mesh = None
    if args.sharded:
        from research_image_retrieval_tpu.parallel import default_search_mesh

        mesh = default_search_mesh()
        print(f"sharding the gallery over {mesh.shape['data']} devices")
    service = SearchService.from_npz(
        args.gallery,
        engine=args.engine,
        k=args.topk,
        max_batch=args.max_batch,
        window_ms=args.window_ms,
        store_dtype=args.store_dtype,
        exact_fp32_scores=args.exact_fp32_scores,
        selection=args.selection,
        mesh=mesh,
    )
    extractor = None
    if args.model:
        if not args.checkpoint:
            print(f"WARNING: --model {args.model} without --checkpoint — "
                  "image search runs RANDOM-INIT weights (debug only)")
        extractor = ImageExtractor(args.model, checkpoint=args.checkpoint,
                                   imsize=args.imsize,
                                   multiscale=args.multiscale)
    if not args.no_warmup:
        print("warming engine buckets "
              f"(1..{service.max_batch}, k={service.k}) ...")
        service.warmup()

    server = make_http_server(service, host=args.host, port=args.port,
                              extractor=extractor, verbose=args.verbose)
    print(f"rir-serve: {service.engine} engine over "
          f"{service.n_gallery} x {service.dim} index on "
          f"http://{args.host}:{args.port} "
          f"(image search: {'on' if extractor else 'off'})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        service.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
