"""Partial checkpoint load (key remap + shape filter) and TB writer.

Reference contract: utils/helpfunc.py:342-368 — ``load_checkpoint`` strips
a 'globalmodel.' key prefix and merges only same-shaped tensors into the
target, leaving everything else (e.g. a different-sized classifier) at its
current value.
"""

import os

import numpy as np

from research_image_retrieval_tpu.train import TensorBoardWriter, partial_load


def _tree():
    return {
        "params": {
            "backbone": {"conv1": {"kernel": np.zeros((3, 3, 3, 8), np.float32)}},
            "whiten": {"kernel": np.zeros((8, 4), np.float32),
                       "bias": np.zeros((4,), np.float32)},
            "classifier_w": np.zeros((10, 4), np.float32),
        }
    }


class TestPartialLoad:
    def test_shape_filtered_merge(self):
        target = _tree()
        source = {
            "params": {
                "backbone": {"conv1": {"kernel": np.ones((3, 3, 3, 8), np.float32)}},
                "whiten": {"kernel": np.ones((8, 4), np.float32),
                           "bias": np.ones((4,), np.float32)},
                # classifier trained with a DIFFERENT class count
                "classifier_w": np.ones((77, 4), np.float32),
                # module that doesn't exist in the target
                "extra_head": {"kernel": np.ones((4, 4), np.float32)},
            }
        }
        merged, report = partial_load(target, source)
        assert np.all(merged["params"]["backbone"]["conv1"]["kernel"] == 1)
        assert np.all(merged["params"]["whiten"]["kernel"] == 1)
        # mismatched classifier kept at target value
        assert np.all(merged["params"]["classifier_w"] == 0)
        assert merged["params"]["classifier_w"].shape == (10, 4)
        assert "params/classifier_w" in report["shape_mismatch"]
        assert "params/extra_head/kernel" in report["unmatched_source"]
        assert "params/whiten/bias" in report["loaded"]
        # target structure unchanged — no extra keys leak in
        assert "extra_head" not in merged["params"]

    def test_prefix_remap(self):
        """The reference's 'globalmodel.' remap (helpfunc.py:349-356)."""
        target = _tree()
        source = {
            "globalmodel": {
                "params": {
                    "whiten": {"kernel": np.full((8, 4), 2.0, np.float32),
                               "bias": np.full((4,), 2.0, np.float32)},
                }
            }
        }
        merged, report = partial_load(
            target, source, rename={"globalmodel/": ""}
        )
        assert np.all(merged["params"]["whiten"]["kernel"] == 2)
        assert "params/whiten/kernel" in report["loaded"]

    def test_callable_rename(self):
        target = _tree()
        source = {"p": {"classifier_w": np.ones((10, 4), np.float32)}}
        merged, _ = partial_load(
            target, source, rename=lambda k: k.replace("p/", "params/")
        )
        assert np.all(merged["params"]["classifier_w"] == 1)


class TestTensorBoardWriter:
    def test_writes_event_file(self, tmp_path):
        logdir = str(tmp_path / "tb")
        with TensorBoardWriter(logdir) as w:
            if not w.enabled:  # tensorboard not installed: no-op contract
                w.write(0, loss=1.0)
                return
            w.write(0, loss=1.0, top1_err=50.0)
            w.write(10, loss=0.5)
            w.flush()
        files = [f for f in os.listdir(logdir) if "tfevents" in f]
        assert files, f"no event files in {logdir}"

    def test_non_scalar_payloads_skipped(self, tmp_path):
        with TensorBoardWriter(str(tmp_path / "tb2")) as w:
            w.write(0, note="a string", loss=1.0)  # must not raise
