"""rir-pack: GLDv2 image tree + train_clean.csv -> .rirrec -> training.

The builder the reference never shipped (its LMDB was cluster-built at a
hardcoded path, configdataset.py:440): pack the reference's 3-level hash
layout losslessly (byte-for-byte JPEG payloads) with contiguous
relabeling, then train a step from the packed records.
"""

import io
import os
import pickle

import numpy as np

from research_image_retrieval_tpu.cli.pack import main as pack_main
from research_image_retrieval_tpu.data import RecordDataset, RecordReader


def _jpeg(rng, h=24, w=24) -> bytes:
    from PIL import Image

    img = Image.fromarray(
        rng.integers(0, 255, (h, w, 3), dtype=np.uint8), "RGB"
    )
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=90)
    return buf.getvalue()


def _write_gldv2_tree(root, csv_path, rng, n_landmarks=3, per_lm=2):
    """Reference layout: {i[0]}/{i[1]}/{i[2]}/{i}.jpg + clean CSV rows
    landmark_id,\"img1 img2 ...\" (configdataset.py:96-131)."""
    rows = []
    blobs = {}
    for lm in range(n_landmarks):
        ids = [f"{lm}{k}abcdef{lm}{k}" for k in range(per_lm)]
        rows.append((100 + lm * 7, " ".join(ids)))  # non-contiguous ids
        for iid in ids:
            p = os.path.join(root, iid[0], iid[1], iid[2])
            os.makedirs(p, exist_ok=True)
            blob = _jpeg(rng)
            open(os.path.join(p, iid + ".jpg"), "wb").write(blob)
            blobs[iid] = blob
    with open(csv_path, "w") as f:
        f.write("landmark_id,images\n")
        for lm, imgs in rows:
            f.write(f'{lm},"{imgs}"\n')
    return blobs


def test_pack_images_tree(tmp_path, rng):
    root = tmp_path / "train"
    csv = tmp_path / "train_clean.csv"
    blobs = _write_gldv2_tree(str(root), str(csv), rng)

    out = tmp_path / "train.rirrec"
    rc = pack_main(["--images", str(root), "--csv", str(csv),
                    "--output", str(out)])
    assert rc == 0

    reader = RecordReader(str(out))
    assert len(reader) == len(blobs) == 6
    # contiguous relabeling: landmark ids {100, 107, 114} -> {0, 1, 2}
    assert sorted(set(reader.labels().tolist())) == [0, 1, 2]
    mapping = pickle.load(open(str(out) + ".relabeling.pkl", "rb"))
    assert mapping == {100: 0, 107: 1, 114: 2}
    # payloads are byte-for-byte the source JPEGs (lossless packing)
    blob0, label0 = reader.get(0)
    assert bytes(bytearray(blob0)) in blobs.values()
    reader.close()

    # ...and the packed file trains: decode + transform round-trip
    ds = RecordDataset(str(out))
    img, label = ds[0]
    assert img.dtype == np.uint8 and img.shape == (24, 24, 3)


def test_pack_missing_images_counted(tmp_path, rng):
    root = tmp_path / "train"
    csv = tmp_path / "train_clean.csv"
    _write_gldv2_tree(str(root), str(csv), rng, n_landmarks=2)
    # CSV lists an image that is not on disk
    with open(csv, "a") as f:
        f.write('999,"zzmissing00"\n')

    out = tmp_path / "t.rirrec"
    rc = pack_main(["--images", str(root), "--csv", str(csv),
                    "--output", str(out)])
    assert rc == 0
    assert len(RecordReader(str(out))) == 4


def test_pack_requires_csv(tmp_path):
    import pytest

    with pytest.raises(SystemExit, match="csv"):
        pack_main(["--images", str(tmp_path), "--output",
                   str(tmp_path / "x.rirrec")])
