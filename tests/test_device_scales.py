"""Device-side multi-scale resize (extract_vectors(device_scales=True)).

Contract: the on-device tap-table resize path produces the SAME
descriptors as the host-resize streaming path (which in turn equals the
reference's exact-shape multi-scale loop, tests/test_bucketed_extract.py)
— including the <36px per-scale skip guard, mixed buckets, padded tail
batches, extent_multiple snapping, and mesh sharding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from research_image_retrieval_tpu.index import extract_vectors
from research_image_retrieval_tpu.models import get_model

SCALES3 = (1.0, 2 ** -0.5, 0.5)


def _gem(rng, outputdim=24):
    model = get_model("gem_r50", backbone_name="resnet18",
                      outputdim=outputdim, num_classes=4)
    im = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(im),
        labels=jnp.zeros((1,), jnp.int32), train=False,
    )
    return model, variables


def test_device_scales_matches_host_path(rng):
    model, variables = _gem(rng)
    masked = lambda x, v: model.apply(variables, x, v, method="extract")
    sizes = [(80, 100), (100, 80), (72, 72), (96, 56), (80, 100)]
    imgs = [rng.standard_normal((h, w, 3)).astype(np.float32)
            for h, w in sizes]

    host = extract_vectors(masked, imgs, scales=SCALES3, bucket=32,
                           batch_size=2)
    dev = extract_vectors(masked, imgs, scales=SCALES3, bucket=32,
                          batch_size=2, device_scales=True)
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)


def test_device_scales_skip_guard(rng):
    """A 50px image drops the 0.5 scale (floor(50*0.5)=25 < 36) on both
    paths; sum/kept averaging must agree."""
    model, variables = _gem(rng)
    masked = lambda x, v: model.apply(variables, x, v, method="extract")
    imgs = [rng.standard_normal((50, 60, 3)).astype(np.float32),
            rng.standard_normal((90, 90, 3)).astype(np.float32)]

    host = extract_vectors(masked, imgs, scales=SCALES3, bucket=32,
                           batch_size=2)
    dev = extract_vectors(masked, imgs, scales=SCALES3, bucket=32,
                          batch_size=2, device_scales=True)
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)


def test_device_scales_all_skipped_raises(rng):
    model, variables = _gem(rng)
    masked = lambda x, v: model.apply(variables, x, v, method="extract")
    tiny = [rng.standard_normal((20, 20, 3)).astype(np.float32)]
    with pytest.raises(ValueError, match="below"):
        extract_vectors(masked, tiny, scales=(0.5,), bucket=32,
                        batch_size=2, device_scales=True)


def test_device_scales_extent_multiple(rng):
    """Patch models: every scale (incl. 1.0) snaps to the grid multiple on
    device, matching the host snap-then-resize path."""
    model = get_model("vit_s16", variant="test", outputdim=32, img_size=64,
                      num_classes=4)
    im = rng.standard_normal((1, 96, 96, 3)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(im),
        labels=jnp.zeros((1,), jnp.int32), train=False,
    )
    multiple = model.extent_multiple
    masked = lambda x, v: model.apply(variables, x, v, method="extract")
    imgs = [rng.standard_normal((h, w, 3)).astype(np.float32)
            for h, w in [(70, 91), (90, 62), (64, 64)]]
    scales = (1.0, 2 ** -0.5)

    host = extract_vectors(masked, imgs, scales=scales, bucket=32,
                           batch_size=2, extent_multiple=multiple)
    dev = extract_vectors(masked, imgs, scales=scales, bucket=32,
                          batch_size=2, extent_multiple=multiple,
                          device_scales=True)
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)


def _norm(u8):
    from research_image_retrieval_tpu.data.transforms import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )

    return ((u8.astype(np.float32) / 255.0 - IMAGENET_MEAN)
            / IMAGENET_STD).astype(np.float32)


def test_uint8_input_norm_matches_host_float_path(rng):
    """RAW uint8 + fused device normalization == host-normalized floats
    through the host-resize path (normalize/resize commute: affine map,
    weights sum to 1)."""
    from research_image_retrieval_tpu.data.transforms import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )

    model, variables = _gem(rng)
    masked = lambda x, v: model.apply(variables, x, v, method="extract")
    sizes = [(80, 100), (100, 80), (72, 72), (96, 56)]
    u8 = [(rng.random((h, w, 3)) * 255).astype(np.uint8) for h, w in sizes]
    host_imgs = [_norm(im) for im in u8]

    for scales in (SCALES3, (1.0,)):
        host = extract_vectors(masked, host_imgs, scales=scales, bucket=32,
                               batch_size=2)
        dev = extract_vectors(masked, u8, scales=scales, bucket=32,
                              batch_size=2, device_scales=True,
                              input_norm=(IMAGENET_MEAN, IMAGENET_STD))
        np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)


def test_uint8_single_scale_upscale_guard(rng):
    """Single-scale uint8 mode applies the reference's <36px UPSCALE
    guard (helpfunc.py:22-29) through the device resize program."""
    from research_image_retrieval_tpu.data.transforms import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )

    model, variables = _gem(rng)
    masked = lambda x, v: model.apply(variables, x, v, method="extract")
    u8 = [(rng.random((20, 30, 3)) * 255).astype(np.uint8),
          (rng.random((60, 60, 3)) * 255).astype(np.uint8)]
    host_imgs = [_norm(im) for im in u8]

    host = extract_vectors(masked, host_imgs, scales=(1.0,), bucket=32,
                           batch_size=2)
    dev = extract_vectors(masked, u8, scales=(1.0,), bucket=32,
                          batch_size=2, device_scales=True,
                          input_norm=(IMAGENET_MEAN, IMAGENET_STD))
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)


def test_uint8_input_norm_patch_model(rng):
    """RAW uint8 fused normalization on a PATCH model (ViT).

    The device path resizes uint8 then normalizes; the host path
    normalizes then resizes.  The two orders are equal in exact
    arithmetic (affine map, resize weights sum to 1) but differ by
    ~1 ULP in fp32, and LayerNorm-based models AMPLIFY that far beyond
    the convnets' 1e-5 agreement — measured up to ~1e-3 on random-init
    weights.  Pin (a) descriptor cosine ~1 (the retrieval-relevant
    invariant — both paths rank identically) and (b) the amplified
    absolute deviation stays under 5e-3, well below the uint8
    quantization noise already present in the input."""
    from research_image_retrieval_tpu.data.transforms import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )

    model = get_model("vit_s16", variant="test", outputdim=32, img_size=64,
                      num_classes=4)
    im = rng.standard_normal((1, 96, 96, 3)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(im),
        labels=jnp.zeros((1,), jnp.int32), train=False,
    )
    multiple = model.extent_multiple
    masked = lambda x, v: model.apply(variables, x, v, method="extract")
    u8 = [(rng.random((h, w, 3)) * 255).astype(np.uint8)
          for h, w in [(70, 91), (90, 62), (64, 64)]]
    host_imgs = [_norm(im) for im in u8]
    scales = (1.0, 2 ** -0.5)

    host = extract_vectors(masked, host_imgs, scales=scales, bucket=32,
                           batch_size=2, extent_multiple=multiple)
    dev = extract_vectors(masked, u8, scales=scales, bucket=32,
                          batch_size=2, extent_multiple=multiple,
                          device_scales=True,
                          input_norm=(IMAGENET_MEAN, IMAGENET_STD))
    cos = np.sum(dev * host, axis=1)  # both L2-normalized
    assert cos.min() > 1 - 1e-6, cos
    np.testing.assert_allclose(dev, host, atol=5e-3)


def test_input_norm_misuse_raises(rng):
    model, variables = _gem(rng)
    masked = lambda x, v: model.apply(variables, x, v, method="extract")
    f32 = [rng.standard_normal((64, 64, 3)).astype(np.float32)]
    u8 = [(rng.random((64, 64, 3)) * 255).astype(np.uint8)]
    norm = (np.zeros(3, np.float32), np.ones(3, np.float32))

    with pytest.raises(ValueError, match="device_scales"):
        extract_vectors(masked, u8, bucket=32, input_norm=norm)
    with pytest.raises(ValueError, match="uint8"):
        extract_vectors(masked, f32, bucket=32, device_scales=True,
                        input_norm=norm)


def test_device_scales_mesh_matches_single_device(rng):
    from research_image_retrieval_tpu.parallel import make_mesh

    model, variables = _gem(rng, outputdim=16)
    masked = lambda x, v: model.apply(variables, x, v, method="extract")
    imgs = [rng.standard_normal((40 + 3 * i, 40, 3)).astype(np.float32)
            for i in range(6)]
    scales = (1.0, 2 ** -0.5)

    single = extract_vectors(masked, imgs, scales=scales, bucket=32,
                             batch_size=8, device_scales=True)
    mesh = make_mesh(data=8, model=1)
    sharded = extract_vectors(masked, imgs, scales=scales, bucket=32,
                              batch_size=8, mesh=mesh, device_scales=True)
    np.testing.assert_allclose(sharded, single, atol=1e-6)
