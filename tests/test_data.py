"""Data-layer tests: Revisited loader, GLDv2 builders, transforms, pipeline."""

import os
import pickle

import numpy as np
import pytest

from research_image_retrieval_tpu.data import (
    EvalTransform,
    GLDv2FileDataset,
    ImageFromList,
    RevisitedDataset,
    ShardedBatchIterator,
    SyntheticRetrievalDataset,
    TrainTransform,
    build_gldv2_train_val,
    imthumbnail,
    parse_clean_csv,
    relabel_contiguous,
    stratified_split,
)


@pytest.fixture()
def fake_revisited(tmp_path):
    root = tmp_path / "rox"
    (root / "roxford5k" / "jpg").mkdir(parents=True)
    gnd = {
        "imlist": ["img_a", "img_b"],
        "qimlist": ["q_0"],
        "gnd": [{"easy": np.array([0]), "hard": np.array([1]),
                 "junk": np.array([]), "bbx": (1.0, 2.0, 30.0, 40.0)}],
    }
    with open(root / "roxford5k" / "gnd_roxford5k.pkl", "wb") as f:
        pickle.dump(gnd, f)
    return str(root)


class TestRevisited:
    def test_loader(self, fake_revisited):
        ds = RevisitedDataset("roxford5k", fake_revisited)
        assert ds.n == 2 and ds.nq == 1
        assert ds.im_fname(0).endswith("jpg/img_a.jpg")
        assert ds.query_bbx(0) == (1.0, 2.0, 30.0, 40.0)

    def test_unknown_dataset(self, fake_revisited):
        with pytest.raises(ValueError, match="Unknown dataset"):
            RevisitedDataset("imagenet", fake_revisited)


@pytest.fixture()
def fake_gldv2(tmp_path):
    import cv2

    root = tmp_path / "gld"
    ids = ["abc123", "abd456", "bcd789", "bce012", "cde345", "cdf678"]
    labels = [100, 100, 250, 250, 250, 999]
    for i in ids:
        p = root / i[0] / i[1] / i[2]
        p.mkdir(parents=True, exist_ok=True)
        img = np.random.default_rng(0).integers(0, 255, (32, 48, 3), np.uint8)
        cv2.imwrite(str(p / f"{i}.jpg"), img)
    csv = tmp_path / "train_clean.csv"
    csv.write_text(
        "landmark_id,images\n"
        "100,abc123 abd456\n250,bcd789 bce012 cde345\n999,cdf678\n"
    )
    return str(root), str(csv), ids, labels


class TestGLDv2:
    def test_csv_parse_and_relabel(self, fake_gldv2, tmp_path):
        _, csv, ids, labels = fake_gldv2
        got_ids, got_labels = parse_clean_csv(csv)
        assert list(got_ids) == ids
        new, mapping = relabel_contiguous(
            got_labels, save_path=str(tmp_path / "rl.pkl")
        )
        assert sorted(set(new)) == [0, 1, 2]
        assert os.path.exists(tmp_path / "rl.pkl")

    def test_stratified_split_deterministic(self):
        labels = np.repeat([0, 1, 2], 5)
        t1, v1 = stratified_split(labels, val_per_class=1, seed=11)
        t2, v2 = stratified_split(labels, val_per_class=1, seed=11)
        np.testing.assert_array_equal(t1, t2)
        np.testing.assert_array_equal(v1, v2)
        assert len(v1) == 3 and len(t1) == 12
        # each class contributes exactly one val sample
        assert sorted(labels[v1]) == [0, 1, 2]

    def test_file_dataset_and_builder(self, fake_gldv2):
        root, csv, _, _ = fake_gldv2
        train, val, ncls = build_gldv2_train_val(root, csv, val_per_class=1)
        assert ncls == 3
        assert len(train) + len(val) == 6 and len(val) == 3
        img, label = train[0]
        assert img.ndim == 3 and img.shape[2] == 3
        assert 0 <= label < 3


class TestTransforms:
    def test_train_transform_shape_and_determinism(self, rng):
        img = (rng.uniform(0, 1, (80, 100, 3)) * 255).astype(np.uint8)
        t = TrainTransform(imsize=32, seed=5)
        out1, out2 = t(img, index=7), t(img, index=7)
        assert out1.shape == (32, 32, 3)
        np.testing.assert_array_equal(out1, out2)  # per-index determinism
        out3 = t(img, index=8)
        assert not np.allclose(out1, out3)  # different index, different aug

    def test_eval_transform(self, rng):
        img = (rng.uniform(0, 1, (100, 120, 3)) * 255).astype(np.uint8)
        out = EvalTransform(imsize=28)(img)
        assert out.shape == (28, 28, 3)

    def test_imthumbnail_preserves_aspect(self, rng):
        img = (rng.uniform(0, 1, (100, 50, 3)) * 255).astype(np.uint8)
        out = imthumbnail(img, 60)
        assert max(out.shape[:2]) == 60
        assert abs(out.shape[0] / out.shape[1] - 2.0) < 0.1


class TestImageFromList:
    def test_bbox_crop_and_thumbnail(self, tmp_path, rng):
        import cv2

        p = tmp_path / "x.jpg"
        cv2.imwrite(str(p), (rng.uniform(0, 255, (60, 90, 3))).astype(np.uint8))
        loader = ImageFromList([str(p)], imsize=30, bbxs=[(10, 5, 70, 55)])
        img = loader[0]
        assert max(img.shape[:2]) == 30
        # 60x50 crop -> thumbnail max side 30 (w side)
        assert img.shape[1] == 30

    def test_fast_decode_prescale(self, tmp_path):
        """DCT-prescaled decode yields the same shape and near-identical
        pixels for smooth content; bbox images keep the full decode (crop
        coordinates are in original pixels)."""
        import cv2

        h, w = 256, 512
        yy, xx = np.mgrid[0:h, 0:w]
        smooth = np.stack(
            [xx * (255 / w), yy * (255 / h), (xx + yy) * (255 / (h + w))],
            axis=-1,
        ).astype(np.uint8)
        p = tmp_path / "big.jpg"
        cv2.imwrite(str(p), cv2.cvtColor(smooth, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 97])

        exact = ImageFromList([str(p)], imsize=64)[0]
        fast = ImageFromList([str(p)], imsize=64, fast_decode=True)[0]
        assert fast.shape == exact.shape
        # prescaled pixels interpolate differently but stay close on
        # smooth content (both paths end in the exact thumbnail resize)
        assert np.mean(np.abs(fast - exact)) < 0.05

        bb_exact = ImageFromList([str(p)], imsize=64,
                                 bbxs=[(10, 10, 200, 100)])[0]
        bb_fast = ImageFromList([str(p)], imsize=64, fast_decode=True,
                                bbxs=[(10, 10, 200, 100)])[0]
        np.testing.assert_array_equal(bb_fast, bb_exact)


class TestPipeline:
    def test_sharding_covers_all_once(self):
        ds = SyntheticRetrievalDataset(num_classes=4, samples_per_class=8,
                                       image_size=16)
        seen = []
        for shard in range(4):
            it = ShardedBatchIterator(
                ds, batch_size=2, seed=1, shard_index=shard, shard_count=4,
                num_workers=0,
            )
            for imgs, labels in it.epoch_batches():
                assert imgs.shape == (2, 16, 16, 3)
                seen.append(labels)
        # 32 samples / 4 shards / batch 2 = 4 batches per shard, all seen
        assert len(np.concatenate(seen)) == 32

    def test_resume_mid_epoch(self):
        ds = SyntheticRetrievalDataset(num_classes=2, samples_per_class=8,
                                       image_size=16)
        it = ShardedBatchIterator(ds, batch_size=4, seed=3, shard_index=0,
                                  shard_count=1, num_workers=0)
        batches = it.epoch_batches()
        first = next(batches)
        state = it.state_dict()
        rest_labels = [lb for _, lb in batches]

        it2 = ShardedBatchIterator(ds, batch_size=4, seed=3, shard_index=0,
                                   shard_count=1, num_workers=0)
        it2.load_state_dict(state)
        resumed_labels = [lb for _, lb in it2.epoch_batches()]
        assert len(resumed_labels) == len(rest_labels)
        for a, b in zip(rest_labels, resumed_labels):
            np.testing.assert_array_equal(a, b)

    def test_epoch_advance_changes_order(self):
        ds = SyntheticRetrievalDataset(num_classes=2, samples_per_class=8,
                                       image_size=16)
        it = ShardedBatchIterator(ds, batch_size=8, seed=3, shard_index=0,
                                  shard_count=1, num_workers=0)
        e0 = [lb.tolist() for _, lb in it.epoch_batches()]
        e1 = [lb.tolist() for _, lb in it.epoch_batches()]
        assert it.epoch == 2
        assert e0 != e1


class TestPrefetchedImages:
    """Decode-ahead wrapper: same items, same order, lazy, any depth."""

    def test_matches_direct_iteration(self, tmp_path):
        import cv2

        from research_image_retrieval_tpu.data import (
            ImageFromList,
            PrefetchedImages,
        )

        rng = np.random.default_rng(0)
        paths = []
        for i in range(7):
            img = (rng.random((40 + i, 50, 3)) * 255).astype(np.uint8)
            p = str(tmp_path / f"{i}.jpg")
            cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            paths.append(p)
        ds = ImageFromList(paths, imsize=32, raw_uint8=True)
        direct = [np.asarray(x) for x in ds]
        for depth, workers in [(1, 1), (3, 2), (16, 2)]:
            pre = PrefetchedImages(ds, depth=depth, workers=workers)
            assert len(pre) == len(ds)
            got = [np.asarray(x) for x in pre]
            assert len(got) == len(direct)
            for a, b in zip(got, direct):
                np.testing.assert_array_equal(a, b)

    def test_empty(self):
        from research_image_retrieval_tpu.data import PrefetchedImages

        class Empty:
            def __len__(self):
                return 0

            def __getitem__(self, i):
                raise IndexError

        assert list(PrefetchedImages(Empty())) == []
