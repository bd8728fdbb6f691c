"""RAW-uint8 training input path: device-fused normalization.

The transforms can yield RAW uint8 crops (``raw_uint8=True``) and the
train/eval steps fuse ``(x/255 - mean)/std`` on-device
(``make_train_step(input_norm=...)``) — 4x fewer H2D bytes, no host float
math.  The reference normalizes on the host after a uint8 PIL
augmentation stack (configdataset.py:417-424), so uint8 staging is
actually CLOSER to reference semantics than the float host path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    EvalTransform,
    TrainTransform,
)
from research_image_retrieval_tpu.models import get_model
from research_image_retrieval_tpu.train import (
    create_train_state,
    make_eval_step,
    make_sgd_optimizer,
    make_train_step,
)


def _host_norm(u8):
    return ((np.asarray(u8, np.float32) / 255.0 - IMAGENET_MEAN)
            / IMAGENET_STD).astype(np.float32)


@pytest.fixture(scope="module")
def photo():
    rng = np.random.default_rng(7)
    # smooth-ish synthetic photo: low-freq field + noise, uint8
    base = rng.integers(0, 256, (12, 16, 3)).astype(np.float32)
    img = np.kron(base, np.ones((8, 8, 1), np.float32))
    img += rng.normal(0, 6.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


class TestRawTransforms:
    def test_train_transform_yields_uint8(self, photo):
        t = TrainTransform(imsize=64, seed=3, raw_uint8=True)
        out = t(photo, index=5)
        assert out.dtype == np.uint8
        assert out.shape == (64, 64, 3)

    def test_raw_close_to_float_path(self, photo):
        """Same (seed, epoch, index) RNG stream: the uint8-staged crop,
        host-normalized, matches the float path within quantization."""
        raw_t = TrainTransform(imsize=64, seed=3, raw_uint8=True)
        flt_t = TrainTransform(imsize=64, seed=3)
        for idx in range(4):
            a = _host_norm(raw_t(photo, index=idx))
            b = flt_t(photo, index=idx)
            # each uint8 staging point quantizes by <= 0.5/255; contrast /
            # saturation couple pixels so allow a few steps, normalized
            assert np.abs(a - b).max() < 6.0 / 255.0 / float(
                np.min(IMAGENET_STD)
            )
            assert np.abs(a - b).mean() < 1.0 / 255.0 / float(
                np.min(IMAGENET_STD)
            )

    def test_eval_transform_raw(self, photo):
        t = EvalTransform(imsize=64, raw_uint8=True)
        out = t(photo)
        assert out.dtype == np.uint8 and out.shape == (64, 64, 3)
        ref = EvalTransform(imsize=64)(photo)
        assert np.abs(_host_norm(out) - ref).max() < 4.0 / 255.0 / float(
            np.min(IMAGENET_STD)
        )

    def test_float_source_converted(self):
        t = TrainTransform(imsize=32, seed=0, raw_uint8=True)
        out = t(np.random.default_rng(0).random((48, 48, 3)).astype(
            np.float32))
        assert out.dtype == np.uint8

    def test_bgr_raw_rejected(self):
        with pytest.raises(ValueError):
            TrainTransform(imsize=32, bgr=True, raw_uint8=True)
        with pytest.raises(ValueError):
            EvalTransform(imsize=32, bgr=True, raw_uint8=True)


class TestFusedNormStep:
    def test_fused_prep_matches_host_norm(self):
        """The fused ``(x/255 - mean)/std`` stage matches numpy host
        normalization to fp32 round-off (~1 ULP — XLA compiles the
        divisions as multiply-by-reciprocal, so it is NOT bitwise)."""
        from research_image_retrieval_tpu.train.loop import _input_prep

        rng = np.random.default_rng(0)
        u8 = rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
        prep = jax.jit(_input_prep((IMAGENET_MEAN, IMAGENET_STD)))
        np.testing.assert_allclose(
            np.asarray(prep(jnp.asarray(u8))), _host_norm(u8), atol=2e-6
        )

    def test_raw_step_equals_host_norm_step(self):
        """One train step on a uint8 batch with input_norm equals the
        same step on the host-normalized float batch: same loss, and the
        same parameter updates up to fp32 round-off amplified through
        BatchNorm (the fused prep differs from host numpy by ~1 ULP;
        the per-leaf update difference stays < 0.3% of the update)."""
        model = get_model("gem_r50", backbone_name="resnet18",
                          outputdim=32, num_classes=8)
        rng = np.random.default_rng(0)
        u8 = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
        labels = jnp.asarray(rng.integers(0, 8, 4))
        host = jnp.asarray(_host_norm(u8))
        tx = make_sgd_optimizer(0.1, momentum=0.9)

        def fresh():
            return create_train_state(
                model, jax.random.PRNGKey(0), host[:1], labels[:1], tx
            )

        s0 = fresh()
        step_raw = make_train_step(
            model, tx, donate=False,
            input_norm=(IMAGENET_MEAN, IMAGENET_STD),
        )
        step_host = make_train_step(model, tx, donate=False)
        s1, m1 = step_raw(fresh(), jnp.asarray(u8), labels)
        s2, m2 = step_host(fresh(), host, labels)
        np.testing.assert_allclose(m1["loss"], m2["loss"], rtol=1e-5)

        def upd_close(a, b, z):
            diff = float(jnp.max(jnp.abs(a - b)))
            upd = float(jnp.max(jnp.abs(b - z)))
            assert diff <= 3e-3 * upd + 1e-6, (diff, upd)

        jax.tree.map(upd_close, s1.params, s2.params, s0.params)

        ev_raw = make_eval_step(
            model, input_norm=(IMAGENET_MEAN, IMAGENET_STD)
        )
        ev_host = make_eval_step(model)
        e1 = ev_raw(s1, jnp.asarray(u8), labels)
        e2 = ev_host(s1, host, labels)
        np.testing.assert_allclose(e1["loss"], e2["loss"], rtol=1e-6)


class TestDriverRawInput:
    def test_driver_trains_with_raw_input(self, tmp_path):
        """The driver end-to-end with a uint8-yielding dataset: the probe
        batch turns on the fused-normalization path."""
        from research_image_retrieval_tpu.train.driver import train
        from research_image_retrieval_tpu.utils.config import get_preset

        class RawDataset:
            transform = TrainTransform(imsize=24, seed=0, raw_uint8=True)

            def __len__(self):
                return 16

            def __getitem__(self, i):
                rng = np.random.default_rng(i)
                img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
                return self.transform(img, index=i), i % 4

        cfg = get_preset(
            "gem_r50", num_epochs=1, batch_size=8, imsize=24, num_workers=0,
            directory=str(tmp_path), save_freq=1, val_epoch=1, plot_freq=0,
            model_overrides={"backbone_name": "resnet18", "outputdim": 16},
        )
        import research_image_retrieval_tpu.train.driver as drv

        orig = drv.build_datasets
        drv.build_datasets = lambda c: (RawDataset(), RawDataset(), 4)
        try:
            state, hist = train(cfg, max_steps_per_epoch=2)
        finally:
            drv.build_datasets = orig
        assert np.isfinite(hist["train_loss"][0])


class TestSyntheticUint8:
    """synthetic_uint8: the procedural fixture rides the RAW-uint8 path
    (data/synthetic.py uint8=True -> driver fused-norm auto-detect)."""

    def test_uint8_quantizes_float_render(self):
        from research_image_retrieval_tpu.data import SyntheticRetrievalDataset

        f = SyntheticRetrievalDataset(num_classes=2, samples_per_class=2,
                                      image_size=32, seed=7)
        u = SyntheticRetrievalDataset(num_classes=2, samples_per_class=2,
                                      image_size=32, seed=7, uint8=True)
        imf, lf = f[1]
        imu, lu = u[1]
        assert lf == lu
        assert imf.dtype == np.float32 and imu.dtype == np.uint8
        assert np.allclose(imu.astype(np.float32) / 255.0, imf,
                           atol=1 / 255.0 + 1e-6)

    def test_driver_detects_uint8_synthetic(self, tmp_path):
        from research_image_retrieval_tpu.train.driver import train
        from research_image_retrieval_tpu.utils.config import TrainConfig

        cfg = TrainConfig(
            model="gem_r50",
            model_overrides=dict(backbone_name="resnet18", outputdim=16),
            imsize=32, batch_size=8, num_epochs=1, num_workers=0,
            synthetic_classes=2, synthetic_samples=4,
            synthetic_val_samples=2, synthetic_uint8=True,
            directory=str(tmp_path), save_freq=5, seed=3,
        )
        state, hist = train(cfg, max_steps_per_epoch=2)
        assert np.isfinite(hist["train_loss"][0])
