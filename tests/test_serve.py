"""Serving layer: SearchService micro-batching + the HTTP front end.

Covers the production serving surface (serve/service.py, serve/http.py,
cli/serve.py) the reference never had — its closest analogue is the
AdaptiveHybrid prototype's in-process gallery loop
(adaptive_hybrid_retrieval_complete.py:347-433).
"""

import base64
import json
import socket
import threading
import urllib.request

import numpy as np
import pytest

from research_image_retrieval_tpu.serve import (
    ImageExtractor,
    SearchService,
    make_http_server,
)
from research_image_retrieval_tpu.serve.service import _next_pow2


def _unit_rows(rng, n, d):
    v = rng.standard_normal((n, d)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def gallery():
    rng = np.random.default_rng(0)
    return _unit_rows(rng, 512, 32)


def test_next_pow2():
    assert [_next_pow2(n) for n in (1, 2, 3, 5, 32, 33)] == \
        [1, 2, 4, 8, 32, 64]


@pytest.mark.parametrize("engine", ["exact", "approx", "int8"])
def test_service_self_retrieval(gallery, engine):
    with SearchService(gallery, engine=engine, k=5, max_batch=8,
                       store_dtype="float32") as svc:
        q = gallery[17:21]
        scores, idx = svc.search(q, k=3)
        assert scores.shape == (4, 3) and idx.shape == (4, 3)
        # top-1 of each gallery row is itself
        assert list(idx[:, 0]) == [17, 18, 19, 20]
        assert np.all(scores[:, 0] >= scores[:, 1] - 1e-6)


def test_service_matches_engine_directly(gallery):
    """The batching path returns exactly what one direct engine call
    does, regardless of how requests were split and padded."""
    from research_image_retrieval_tpu.ops import streaming_topk

    ref_s, ref_i = streaming_topk(gallery[:7], gallery, k=9, exact=True)
    with SearchService(gallery, engine="exact", k=9, max_batch=4,
                       store_dtype="float32") as svc:
        # n=7 > max_batch=4 exercises the split + pad-to-bucket path
        s, i = svc.search(gallery[:7])
    np.testing.assert_array_equal(i, np.asarray(ref_i))
    np.testing.assert_allclose(s, np.asarray(ref_s), rtol=0, atol=1e-6)


def test_service_concurrent_requests_coalesce(gallery):
    with SearchService(gallery, engine="exact", k=4, max_batch=16,
                       window_ms=50.0, store_dtype="float32") as svc:
        svc.warmup()
        results = {}
        errs = []

        def one(qi):
            try:
                _, idx = svc.search(gallery[qi], k=1)
                results[qi] = int(idx[0, 0])
            except Exception as e:  # surface failures in the main thread
                errs.append(e)

        threads = [threading.Thread(target=one, args=(qi,))
                   for qi in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        assert results == {qi: qi for qi in range(12)}
        st = svc.stats()
        assert st["requests"] == 12 and st["queries"] == 12
        # engine calls cannot exceed requests; with a 50 ms window most
        # of them coalesce (don't assert a specific count — timing)
        assert 1 <= st["engine_calls"] <= 12
        assert st["latency_ms"]["p50"] >= 0.0


def test_service_from_npz_prequantized(tmp_path, gallery):
    from research_image_retrieval_tpu.ops import quantize_gallery_int8

    qg, scales = quantize_gallery_int8(gallery)
    path = tmp_path / "idx.npz"
    names = np.asarray([f"img{i}" for i in range(len(gallery))])
    np.savez(path, vecs_int8=np.asarray(qg), scales=np.asarray(scales),
             names=names)
    with SearchService.from_npz(str(path), k=3, max_batch=4) as svc:
        assert svc.engine == "int8"
        scores, idx = svc.search(gallery[5])
        assert idx[0, 0] == 5
        assert svc.match_names(idx)[0, 0] == "img5"
    # the same prequantized file can serve a float engine (dequantized)
    with SearchService.from_npz(str(path), engine="exact", k=3,
                                store_dtype="float32") as svc:
        _, idx = svc.search(gallery[9])
        assert idx[0, 0] == 9


def test_service_input_validation(gallery):
    with SearchService(gallery, k=5, store_dtype="float32") as svc:
        with pytest.raises(ValueError):
            svc.search(np.zeros((2, 7), np.float32))  # wrong dim
        with pytest.raises(ValueError):
            svc.search(gallery[0], k=6)  # k above the server-wide max
        with pytest.raises(ValueError):
            svc.search(gallery[0], k=0)
    with pytest.raises(RuntimeError):
        svc.search(gallery[0])  # closed


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def http_server(gallery):
    names = np.asarray([f"g{i}" for i in range(len(gallery))])
    svc = SearchService(gallery, names=names, engine="exact", k=10,
                        max_batch=8, store_dtype="float32")
    server = make_http_server(svc, port=_free_port())
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield server, f"http://127.0.0.1:{server.server_address[1]}"
    finally:
        server.shutdown()
        server.server_close()
        svc.close()


def test_http_endpoints(http_server, gallery):
    server, url = http_server
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok"
    assert health["gallery_size"] == 512 and health["image_search"] is False

    code, out = _post(url + "/search",
                      {"vectors": gallery[3:5].tolist(), "k": 2})
    assert code == 200
    assert [m["matches"][0]["index"] for m in out["results"]] == [3, 4]
    assert out["results"][0]["matches"][0]["name"] == "g3"
    assert out["results"][0]["matches"][0]["score"] == pytest.approx(
        1.0, abs=1e-3)

    with urllib.request.urlopen(url + "/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert stats["requests"] >= 1 and stats["queries"] >= 2

    # error surfaces: bad dim -> 400, bad path -> 404, image off -> 400
    code, out = _post(url + "/search", {"vectors": [[0.0, 1.0]]})
    assert code == 400 and "error" in out
    code, out = _post(url + "/nope", {"x": 1})
    assert code == 404
    code, out = _post(url + "/search/image", {"image_b64": "aGk="})
    assert code == 400 and "without --model" in out["error"]


def test_http_image_search(tmp_path):
    """End-to-end: images -> extractor -> descriptor gallery -> HTTP
    image query retrieves itself (random-init tiny model on CPU)."""
    import cv2

    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 255, (48 + 8 * i, 56, 3), np.uint8)
            for i in range(3)]
    extractor = ImageExtractor("gem_r50", imsize=64, batch_size=2)
    vecs = extractor(imgs)
    assert vecs.shape[0] == 3
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, atol=1e-4)

    svc = SearchService(vecs, engine="exact", k=3, store_dtype="float32")
    server = make_http_server(svc, port=_free_port(), extractor=extractor)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
            assert json.loads(r.read())["image_search"] is True
        ok, buf = cv2.imencode(
            ".jpg", cv2.cvtColor(imgs[1], cv2.COLOR_RGB2BGR),
            [cv2.IMWRITE_JPEG_QUALITY, 98])
        assert ok
        code, out = _post(url + "/search/image", {
            "image_b64": base64.b64encode(buf.tobytes()).decode(), "k": 1})
        assert code == 200
        # jpeg round-trip perturbs the descriptor a little; the nearest
        # gallery image must still be the source image itself
        assert out["results"][0]["matches"][0]["index"] == 1
    finally:
        server.shutdown()
        server.server_close()
        svc.close()


def test_cli_serve_parser():
    from research_image_retrieval_tpu.cli.serve import build_parser

    args = build_parser().parse_args(
        ["--gallery", "g.npz", "--engine", "int8", "--port", "1234",
         "--max-batch", "5"])
    assert args.engine == "int8" and args.port == 1234
    assert args.max_batch == 5  # rounded to 8 inside the service
    assert args.sharded is False
    args = build_parser().parse_args(["--gallery", "g.npz", "--sharded"])
    assert args.sharded is True


# ------------------------------------------------------- sharded serving


@pytest.mark.parametrize("engine", ["exact", "int8"])
def test_service_sharded_matches_unsharded(engine):
    """The ICI-sharded daemon path (gallery row-sharded over the 8-device
    mesh, per-shard streams + [Q, k] all_gather merge) returns exactly
    what the single-device service does — including with a gallery size
    that is NOT a multiple of the shard count (pad-row masking)."""
    from research_image_retrieval_tpu.parallel import default_search_mesh

    rng = np.random.default_rng(11)
    g = _unit_rows(rng, 509, 32)  # 509 % 8 != 0 -> exercises padding
    q = g[[3, 100, 508]]
    mesh = default_search_mesh()
    assert mesh.shape["data"] == 8  # conftest's virtual CPU mesh
    kw = dict(engine=engine, k=7, max_batch=4, store_dtype="float32")
    with SearchService(g, **kw) as ref_svc:
        ref_s, ref_i = ref_svc.search(q)
    with SearchService(g, mesh=mesh, **kw) as svc:
        s, i = svc.search(q)
        st = svc.stats()
    assert st["shards"] == 8
    np.testing.assert_array_equal(i, ref_i)
    np.testing.assert_allclose(s, ref_s, rtol=0, atol=1e-5)
    assert list(i[:, 0]) == [3, 100, 508]  # self-retrieval across shards


def test_service_sharded_prequantized_and_validation(gallery):
    """Prequantized int8 index served sharded == served unsharded; the
    approx engine is rejected up front (selection='approx' on int8 is
    the supported fast path)."""
    from research_image_retrieval_tpu.ops import quantize_gallery_int8
    from research_image_retrieval_tpu.parallel import default_search_mesh

    mesh = default_search_mesh()
    qg, scales = quantize_gallery_int8(gallery)
    kw = dict(vecs_int8=np.asarray(qg), scales=np.asarray(scales),
              k=5, max_batch=8)
    with SearchService(**kw) as ref_svc:
        ref_s, ref_i = ref_svc.search(gallery[40:44])
    with SearchService(mesh=mesh, **kw) as svc:
        s, i = svc.search(gallery[40:44])
    np.testing.assert_array_equal(i, ref_i)
    np.testing.assert_allclose(s, ref_s, rtol=0, atol=1e-5)

    with pytest.raises(ValueError, match="sharded"):
        SearchService(gallery, engine="approx", mesh=mesh)
