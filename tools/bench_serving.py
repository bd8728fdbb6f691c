"""Serving-under-load benchmark on the real chip (BENCH.md table).

Drives one resident SearchService (the rir-serve core) with N
concurrent client threads at the GLDv2-scale operating point
(1.4M x 2048 gallery) and records QPS, p50/p99 latency, and coalescing
efficiency from the service's own stats — for the exact and int8
engines (the approx selector composes on int8 via selection="approx").
The gallery is GENERATED ON DEVICE so the run measures serving, not the
tunnel transfer of an 11 GB index.

    python tools/bench_serving.py [--n 1400000] [--clients 8] [--reqs 40]

Prints one JSON line per (engine, clients) combination.
(reference serving loop: adaptive_hybrid_retrieval_complete.py:384-433)
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def run_load(svc, queries, clients: int, reqs_per_client: int,
             batch: int) -> dict:
    svc.warmup()
    # drain warmup counters by snapshotting before the run
    before = svc.stats()
    lat = [[] for _ in range(clients)]
    errors = []

    def client(tid):
        rng = np.random.default_rng(tid)
        try:
            for _ in range(reqs_per_client):
                q = queries[rng.integers(0, len(queries), batch)]
                t0 = time.perf_counter()
                svc.search(q)
                lat[tid].append((time.perf_counter() - t0) * 1e3)
        except Exception as e:  # noqa: BLE001 — surfaced in the result
            errors.append(repr(e))

    threads = [threading.Thread(target=client, args=(t,))
               for t in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    after = svc.stats()
    all_lat = sorted(x for ls in lat for x in ls)
    n_req = len(all_lat)
    calls = after["engine_calls"] - before["engine_calls"]
    reqs = after["requests"] - before["requests"]
    return {
        "clients": clients,
        "batch_per_request": batch,
        "requests": n_req,
        "errors": errors,
        "qps": round(n_req / wall, 1),
        "queries_per_s": round(n_req * batch / wall, 1),
        "p50_ms": round(all_lat[n_req // 2], 2),
        "p99_ms": round(all_lat[min(n_req - 1, int(n_req * 0.99))], 2),
        "engine_calls": calls,
        "coalescing": round(reqs / max(calls, 1), 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_400_000)
    ap.add_argument("--d", type=int, default=2048)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--reqs", type=int, default=40)
    ap.add_argument("--batch", type=int, default=1,
                    help="queries per request")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from research_image_retrieval_tpu.ops import quantize_gallery_int8
    from research_image_retrieval_tpu.serve import SearchService
    from research_image_retrieval_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    N, D = args.n, args.d

    @jax.jit
    def make_gallery(key):
        g = jax.random.normal(key, (N, D), jnp.bfloat16)
        n = jnp.linalg.norm(g.astype(jnp.float32), axis=1, keepdims=True)
        return (g.astype(jnp.float32) / n).astype(jnp.bfloat16)

    g = make_gallery(jax.random.PRNGKey(0))
    g.block_until_ready()
    rng = np.random.default_rng(1)
    queries = rng.standard_normal((256, D)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    qg, gs = jax.jit(quantize_gallery_int8)(g)
    qg.block_until_ready()

    for engine, kw in (
        ("int8", dict(vecs_int8=qg, scales=gs)),
        ("int8_approx", dict(vecs_int8=qg, scales=gs, selection="approx")),
        ("exact", dict(gallery=g)),
    ):
        eng = "int8" if engine.startswith("int8") else engine
        with SearchService(engine=eng, k=args.k, max_batch=32,
                           window_ms=2.0, **kw) as svc:
            for clients in (1, args.clients):
                r = run_load(svc, queries, clients, args.reqs, args.batch)
                print(json.dumps({"engine": engine, **r}), flush=True)
        del svc


if __name__ == "__main__":
    main()
