"""Serving under concurrent load: correctness + coalescing.

N client threads fire bursts of queries at one SearchService (direct
API and through the HTTP daemon); every response must equal the
single-threaded reference ranking, and the micro-batching worker must
actually coalesce (engine_calls < requests).  The real-chip QPS /
latency numbers live in BENCH.md (tools/bench_serving.py); this test
pins the CONCURRENCY SEMANTICS on CPU.
(reference serving loop: adaptive_hybrid_retrieval_complete.py:384-433)
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from research_image_retrieval_tpu.serve import SearchService


@pytest.fixture(scope="module")
def gallery():
    rng = np.random.default_rng(0)
    g = rng.standard_normal((512, 32)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = rng.standard_normal((64, 32)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return g, q


@pytest.mark.parametrize("engine", ["exact", "int8"])
def test_concurrent_clients_match_reference(gallery, engine):
    g, q = gallery
    with SearchService(g, engine=engine, k=10, max_batch=16,
                       window_ms=2.0, store_dtype="float32") as svc:
        svc.warmup()
        ref_i = [svc.search(q[i])[1] for i in range(len(q))]

        results = [None] * len(q)
        errors = []

        def client(tid, idxs):
            try:
                for i in idxs:
                    results[i] = svc.search(q[i])[1]
            except Exception as e:  # noqa: BLE001 — collected for assert
                errors.append((tid, e))

        threads = [
            threading.Thread(target=client,
                             args=(t, range(t, len(q), 8)))
            for t in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        for i in range(len(q)):
            np.testing.assert_array_equal(results[i], ref_i[i])

        s = svc.stats()
        assert s["requests"] == 2 * len(q)
        # micro-batching must have coalesced at least SOME of the
        # 8-thread burst (engine calls < requests proves batching)
        assert s["engine_calls"] < s["requests"], s
        assert s["latency_ms"]["p50"] >= 0.0


def test_http_daemon_under_load(gallery):
    g, q = gallery
    from research_image_retrieval_tpu.serve import make_http_server

    with SearchService(g, engine="int8", k=10, max_batch=16) as svc:
        svc.warmup()
        ref = [svc.search(q[i])[1][0].tolist() for i in range(16)]
        server = make_http_server(svc, port=0)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        port = server.server_address[1]
        try:
            results = [None] * 16
            errors = []

            def client(tid):
                try:
                    for i in range(tid, 16, 4):
                        body = json.dumps(
                            {"vectors": [q[i].tolist()], "k": 10}
                        ).encode()
                        req = urllib.request.Request(
                            f"http://127.0.0.1:{port}/search", data=body,
                            headers={"Content-Type": "application/json"},
                        )
                        with urllib.request.urlopen(req, timeout=30) as r:
                            payload = json.loads(r.read())
                        results[i] = payload["results"][0]["matches"]
                except Exception as e:  # noqa: BLE001
                    errors.append((tid, e))

            threads = [threading.Thread(target=client, args=(t,))
                       for t in range(4)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert not errors, errors
            for i in range(16):
                got = [r["index"] for r in results[i]]
                assert got == ref[i], (i, got, ref[i])

            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=10
            ) as r:
                stats = json.loads(r.read())
            assert stats["requests"] >= 32
        finally:
            server.shutdown()
            thread.join(timeout=10)
