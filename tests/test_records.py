"""Packed-record dataset: native mmap reader vs pure-Python fallback.

The TPU-native replacement for the reference's LMDB + pickle data path
(reference: dataset/configdataset.py:245-305): format round-trip,
zero-copy reads, label table, prefetch, subset/transform dataset contract,
and ShardedBatchIterator integration.
"""

import io

import numpy as np
import pytest

from research_image_retrieval_tpu.data import (
    RecordDataset,
    RecordReader,
    ShardedBatchIterator,
    write_records,
)
from research_image_retrieval_tpu.data.records import (
    _PyReader,
    records_native_available,
)


def _jpeg(rng, h=24, w=32) -> bytes:
    from PIL import Image

    img = Image.fromarray(
        rng.integers(0, 255, (h, w, 3), dtype=np.uint8), "RGB"
    )
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=90)
    return buf.getvalue()


@pytest.fixture(scope="module")
def record_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    path = tmp_path_factory.mktemp("rec") / "train.rirrec"
    blobs = [(_jpeg(rng), i % 8) for i in range(40)]
    n = write_records(str(path), blobs)
    assert n == 40
    return str(path), blobs


def test_native_build():
    # the toolchain is part of this environment; the native core must build
    assert records_native_available()


def test_roundtrip_native(record_file):
    path, blobs = record_file
    r = RecordReader(path, native=True)
    assert len(r) == 40
    for i, (blob, label) in enumerate(blobs):
        got, lb = r.get(i)
        assert lb == label
        assert bytes(got.tobytes()) == blob
    np.testing.assert_array_equal(r.labels(), [b[1] for b in blobs])
    r.prefetch([0, 3, 7])  # must not raise
    r.close()


def test_python_fallback_identical(record_file):
    path, blobs = record_file
    py = _PyReader(path)
    nat = RecordReader(path)
    for i in range(len(blobs)):
        a, la = py.get(i)
        b, lb = nat.get(i)
        assert la == lb
        np.testing.assert_array_equal(a, b)
    py.close()
    nat.close()


def test_dataset_contract(record_file):
    path, blobs = record_file
    calls = []

    def transform(img):
        calls.append(img.shape)
        return np.asarray(img, np.float32) / 255.0

    ds = RecordDataset(path, indices=[2, 5, 7], transform=transform)
    assert len(ds) == 3
    img, label = ds[0]
    assert img.dtype == np.float32 and img.shape == (24, 32, 3)
    assert label == blobs[2][1]
    np.testing.assert_array_equal(ds.labels(), [blobs[i][1] for i in (2, 5, 7)])


def test_sharded_iterator_over_records(record_file):
    path, blobs = record_file
    ds = RecordDataset(path)
    it = ShardedBatchIterator(ds, batch_size=4, shuffle=False,
                              shard_index=0, shard_count=1, num_workers=2)
    batches = list(it.epoch_batches())
    assert len(batches) == 10
    images, labels = batches[0]
    assert images.shape == (4, 24, 32, 3)
    np.testing.assert_array_equal(labels, [b[1] for b in blobs[:4]])


def test_corrupt_file_rejected(tmp_path):
    bad = tmp_path / "bad.rirrec"
    bad.write_bytes(b"NOTAREC!" + b"\0" * 100)
    with pytest.raises(ValueError):
        RecordReader(str(bad))


def test_train_driver_from_records(record_file, tmp_path):
    """End-to-end: the train driver resolves a .rirrec data_root, builds a
    seeded per-class split, and completes real steps from the mmap path."""
    from research_image_retrieval_tpu.train.driver import build_datasets, train
    from research_image_retrieval_tpu.utils.config import get_preset

    path, blobs = record_file
    cfg = get_preset(
        "gem_r50", num_epochs=1, batch_size=8, imsize=24, num_workers=0,
        data_root=path, val_per_class=1,
        directory=str(tmp_path / "ck"), save_freq=10,
        model_overrides={"backbone_name": "resnet18", "outputdim": 16},
    )
    train_ds, val_ds, n_cls = build_datasets(cfg)
    assert n_cls == 8
    assert len(train_ds) + len(val_ds) == 40 and len(val_ds) == 8
    assert not set(np.asarray(train_ds.indices)) & set(np.asarray(val_ds.indices))

    state, history = train(cfg, max_steps_per_epoch=2)
    assert int(state.step) >= 1
    assert np.isfinite(history["train_loss"][0])


class _FakeTxn:
    """Duck-typed lmdb transaction over an in-memory dict."""

    def __init__(self, store):
        self.store = store

    def get(self, key):
        return self.store.get(key)

    def cursor(self):
        return iter(self.store.items())

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _FakeEnv:
    def __init__(self, store):
        self.store = store

    def begin(self, write=False):
        return _FakeTxn(self.store)


@pytest.mark.parametrize("with_keys", [True, False])
def test_lmdb_migration_via_fake_env(tmp_path, with_keys):
    """convert_lmdb_to_records runs its full migration logic (reference
    configdataset.py:245-305) against an injected fake env: __keys__
    path AND cursor-scan fallback, pickled (jpeg_bytes, label) decode,
    then a real training step from the migrated records."""
    import pickle

    from research_image_retrieval_tpu.data.records import (
        convert_lmdb_to_records,
    )

    rng = np.random.default_rng(3)
    store = {}
    want = []
    for i in range(16):
        blob, label = _jpeg(rng), i % 8
        store[f"k{i:04d}".encode()] = pickle.dumps((blob, label))
        want.append((blob, label))
    if with_keys:
        store[b"__keys__"] = pickle.dumps(
            [f"k{i:04d}".encode() for i in range(16)]
        )

    out = str(tmp_path / "migrated.rirrec")
    n = convert_lmdb_to_records("fake://path", out,
                                open_env=lambda p: _FakeEnv(store))
    assert n == 16

    reader = RecordReader(out)
    assert len(reader) == 16
    for i, (blob, label) in enumerate(want):
        got_blob, got_label = reader.get(i)
        assert bytes(got_blob) == blob and got_label == label

    # the migrated file trains a real step through the driver
    from research_image_retrieval_tpu.train.driver import train
    from research_image_retrieval_tpu.utils.config import get_preset

    cfg = get_preset(
        "gem_r50", num_epochs=1, batch_size=8, imsize=24, num_workers=0,
        data_root=out, val_per_class=1,
        directory=str(tmp_path / "ck"), save_freq=10, plot_freq=0,
        model_overrides={"backbone_name": "resnet18", "outputdim": 16},
    )
    state, history = train(cfg, max_steps_per_epoch=2)
    assert int(state.step) >= 1 and np.isfinite(history["train_loss"][0])
