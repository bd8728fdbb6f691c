"""Preemption-safe training: signal -> checkpoint -> exact resume."""

import numpy as np

import jax

from research_image_retrieval_tpu.train.driver import train
from research_image_retrieval_tpu.train.preemption import PreemptionGuard
from research_image_retrieval_tpu.utils.config import get_preset


class TestPreemptionGuard:
    def test_programmatic_stop(self):
        g = PreemptionGuard(signals=())
        assert not g.should_stop
        g.request_stop()
        assert g.should_stop
        g.restore()

    def test_sigterm_sets_flag(self):
        import os
        import signal

        g = PreemptionGuard()
        os.kill(os.getpid(), signal.SIGTERM)
        assert g.should_stop
        g.restore()


class TestDriverPreemption:
    def test_save_on_stop_and_resume(self, tmp_path, monkeypatch):
        """Simulate preemption mid-training: a checkpoint appears and a
        resumed run continues from it."""
        import research_image_retrieval_tpu.train.driver as drv

        cfg = get_preset(
            "gem_r50", num_epochs=4, batch_size=8, imsize=24, num_workers=0,
            directory=str(tmp_path / "ck"), save_freq=10,  # no regular saves
            model_overrides={"backbone_name": "resnet18", "outputdim": 16},
        )

        # guard that trips after the second step
        class TrippingGuard(PreemptionGuard):
            def __init__(self):
                super().__init__(signals=())
                self.count = 0

            @property
            def should_stop(self):
                self.count += 1
                return self.count >= 2

        monkeypatch.setattr(drv, "PreemptionGuard", TrippingGuard)
        state, _ = train(cfg, max_steps_per_epoch=3)
        ckpt_dirs = [p.name for p in (tmp_path / "ck").iterdir()
                     if p.name.startswith("epoch_")]
        assert ckpt_dirs, "preemption checkpoint missing"
        saved_step = int(state.step)

        # resume: normal guard again, continues past the saved step
        monkeypatch.setattr(drv, "PreemptionGuard", PreemptionGuard)
        cfg2 = get_preset(
            "gem_r50", num_epochs=2, batch_size=8, imsize=24, num_workers=0,
            directory=str(tmp_path / "ck"), resume="latest",
            model_overrides={"backbone_name": "resnet18", "outputdim": 16},
        )
        state2, _ = train(cfg2, max_steps_per_epoch=2)
        assert int(state2.step) > saved_step
