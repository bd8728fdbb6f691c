"""End-to-end CLI loop: rir-extract over a record file -> rir-search."""

import io
import json

import numpy as np

from research_image_retrieval_tpu.cli.extract import main as extract_main
from research_image_retrieval_tpu.cli.search import main as search_main
from research_image_retrieval_tpu.data import write_records


def _jpeg(rng, h=32, w=32) -> bytes:
    from PIL import Image

    img = Image.fromarray(
        rng.integers(0, 255, (h, w, 3), dtype=np.uint8), "RGB"
    )
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=90)
    return buf.getvalue()


def test_extract_then_search(tmp_path, rng):
    rec = tmp_path / "g.rirrec"
    write_records(str(rec), [(_jpeg(rng), i % 3) for i in range(6)])

    gal_npz = tmp_path / "gal.npz"
    rc = extract_main([
        "--model", "gem_r50", "--records", str(rec), "--imsize", "0",
        "--output", str(gal_npz), "--batch-size", "4",
    ])
    assert rc == 0
    gal = np.load(gal_npz)
    assert gal["vecs"].shape == (6, 2048)
    np.testing.assert_allclose(
        np.linalg.norm(gal["vecs"], axis=1), 1.0, atol=1e-4
    )
    assert "labels" in gal

    out = tmp_path / "res.json"
    rc = search_main([
        "--gallery", str(gal_npz), "--queries", str(gal_npz),
        "--topk", "3", "--output", str(out),
    ])
    assert rc == 0
    res = json.loads(out.read_text())
    assert len(res) == 6
    # self-similarity: every query's top-1 is itself
    for qi, r in enumerate(res):
        assert r["matches"][0]["name"] == str(qi)
        assert r["matches"][0]["score"] > 0.999


def test_records_extract_is_normalized(tmp_path, rng):
    """Regression: --records must feed ImageNet-NORMALIZED pixels to the
    model (an early version fed raw 0-255 uint8 straight through,
    silently producing garbage descriptors for the whole index)."""
    from research_image_retrieval_tpu.data.native_decode import decode_jpeg
    from research_image_retrieval_tpu.data.transforms import normalize
    from research_image_retrieval_tpu.evaluation.driver import (
        _load_model,
        _make_extract_fn,
    )
    from research_image_retrieval_tpu.index import extract_vectors
    from research_image_retrieval_tpu.utils.config import EvalConfig

    jpegs = [_jpeg(rng, 48, 40) for _ in range(3)]
    rec = tmp_path / "g.rirrec"
    write_records(str(rec), [(j, 0) for j in jpegs])

    out = tmp_path / "r.npz"
    rc = extract_main([
        "--model", "gem_r50", "--records", str(rec), "--imsize", "0",
        "--output", str(out), "--batch-size", "2",
    ])
    assert rc == 0
    vecs = np.load(out)["vecs"]

    # reference: the SAME decoded pixels, host-normalized, through the
    # library path with the same (seeded) model weights
    cfg = EvalConfig(model="gem_r50", checkpoint=None, imsize=0)
    model, variables = _load_model(cfg)
    extract, bucket, multiple = _make_extract_fn(model, variables)
    imgs = [normalize(decode_jpeg(j).astype(np.float32) / 255.0)
            for j in jpegs]
    ref = extract_vectors(extract, imgs, bucket=bucket,
                          extent_multiple=multiple, batch_size=2)
    np.testing.assert_allclose(vecs, np.asarray(ref), atol=1e-4)


def test_extract_quantized_index_then_search(tmp_path, rng):
    """rir-extract --quantize-int8 writes vecs_int8+scales; rir-search
    auto-detects it (int8 engine), and dequantizes for other engines."""
    rec = tmp_path / "g.rirrec"
    write_records(str(rec), [(_jpeg(rng), i % 3) for i in range(6)])
    npz = tmp_path / "gal_q.npz"
    rc = extract_main([
        "--model", "gem_r50", "--records", str(rec), "--imsize", "0",
        "--output", str(npz), "--batch-size", "4", "--quantize-int8",
    ])
    assert rc == 0
    gal = np.load(npz)
    assert "vecs" not in gal
    assert gal["vecs_int8"].dtype == np.int8
    assert gal["scales"].shape == (6,)

    # queries must be float vecs: build them from the dequantized index
    qnpz = tmp_path / "q.npz"
    qvecs = gal["vecs_int8"].astype(np.float32) * gal["scales"][:, None]
    np.savez(qnpz, vecs=qvecs, names=np.arange(6))

    for extra in ([], ["--engine", "exact"]):
        out = tmp_path / "res_q.json"
        rc = search_main([
            "--gallery", str(npz), "--queries", str(qnpz),
            "--topk", "3", "--output", str(out), *extra,
        ])
        assert rc == 0
        res = json.loads(out.read_text())
        for qi, r in enumerate(res):
            assert r["matches"][0]["name"] == str(qi), extra

    # --alpha-qe must dequantize the int8 gallery and run; ranking
    # assertions are meaningless here (random-init descriptors of random
    # 32px images are near-identical, so expanded queries collapse)
    rc = search_main([
        "--gallery", str(npz), "--queries", str(qnpz),
        "--topk", "3", "--qe-k", "2", "--alpha-qe",
        "--output", str(tmp_path / "res_qe.json"),
    ])
    assert rc == 0
    assert len(json.loads((tmp_path / "res_qe.json").read_text())) == 6


def test_search_int8_queries_npz(tmp_path, rng):
    """Queries saved as vecs_int8+scales (extract --quantize-int8 on the
    query side) are dequantized transparently; an npz with neither key
    errors out with a clear message."""
    from research_image_retrieval_tpu.ops import quantize_gallery_int8

    vecs = rng.standard_normal((30, 48)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    gal = tmp_path / "gal.npz"
    np.savez(gal, vecs=vecs, names=np.arange(30))
    qv, qs = quantize_gallery_int8(vecs[:5])
    qnpz = tmp_path / "q_int8.npz"
    np.savez(qnpz, vecs_int8=np.asarray(qv), scales=np.asarray(qs),
             names=np.arange(5))
    out = tmp_path / "r.json"
    rc = search_main(["--gallery", str(gal), "--queries", str(qnpz),
                      "--topk", "3", "--output", str(out)])
    assert rc == 0
    res = json.loads(out.read_text())
    assert all(r["matches"][0]["name"] == str(i) for i, r in enumerate(res))

    bad = tmp_path / "bad.npz"
    np.savez(bad, something=np.zeros(3))
    import pytest
    with pytest.raises(SystemExit, match="vecs"):
        search_main(["--gallery", str(gal), "--queries", str(bad),
                     "--topk", "3"])


def test_search_engine_int8(tmp_path, rng):
    """`rir-search --engine int8` runs the quantized serving path; on
    well-separated synthetic descriptors its top-1 matches exact."""
    vecs = rng.standard_normal((40, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    npz = tmp_path / "v.npz"
    np.savez(npz, vecs=vecs, names=np.arange(40))

    out = tmp_path / "res_int8.json"
    rc = search_main([
        "--gallery", str(npz), "--queries", str(npz),
        "--topk", "3", "--engine", "int8", "--output", str(out),
    ])
    assert rc == 0
    res = json.loads(out.read_text())
    for qi, r in enumerate(res):
        assert r["matches"][0]["name"] == str(qi)
        assert r["matches"][0]["score"] > 0.99
