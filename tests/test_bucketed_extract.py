"""Bucketed extract_vectors: host resize fidelity + multi-scale equality.

Contracts under test:
* ``resize_bilinear_np`` (host matmul resize) matches
  ``jax.image.resize(method="bilinear")`` — so the host-side multi-scale
  path agrees with the on-device scale loop of ``multiscale_descriptor``.
* multi-scale bucketed extraction == exact-shape device multi-scale
  (reference sum / kept-scales / re-normalize contract,
  utils/helpfunc.py:30-46).
"""

import jax
import jax.numpy as jnp
import numpy as np

from research_image_retrieval_tpu.index import extract_vectors, multiscale_descriptor
from research_image_retrieval_tpu.index.extract import resize_bilinear_np
from research_image_retrieval_tpu.models import get_model


def test_np_resize_matches_jax():
    rng = np.random.default_rng(0)
    for (h, w), (nh, nw) in [
        ((57, 43), (40, 30)),   # downscale (antialiased)
        ((33, 21), (64, 48)),   # upscale
        ((48, 48), (34, 67)),   # mixed
    ]:
        img = rng.standard_normal((h, w, 3)).astype(np.float32)
        want = np.asarray(
            jax.image.resize(jnp.asarray(img), (nh, nw, 3), method="bilinear")
        )
        got = resize_bilinear_np(img, nh, nw)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_multiscale_bucketed_equals_exact():
    model = get_model(
        "gem_r50", backbone_name="resnet18", outputdim=32, num_classes=8
    )
    init = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), init, labels=jnp.zeros((1,), jnp.int32),
        train=False,
    )
    extract = lambda x: model.apply(variables, x, method="extract")
    masked = lambda x, v: model.apply(variables, x, v, method="extract")

    rng = np.random.default_rng(1)
    sizes = [(72, 56), (56, 72), (80, 80)]
    imgs = [rng.standard_normal((h, w, 3)).astype(np.float32) for h, w in sizes]
    scales = (1.0, 2**-0.5)

    got = extract_vectors(masked, imgs, scales=scales, bucket=32, batch_size=2)
    for i, img in enumerate(imgs):
        want = np.asarray(
            multiscale_descriptor(extract, jnp.asarray(img)[None], scales)
        )[0]
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=2e-5)


def test_streaming_pipeline_matches_synchronous():
    """The async-dispatch streaming path (pipeline_depth > 0, lazy
    generator input, partial batches interleaved across buckets) returns
    the same descriptors in the same order as the synchronous path."""
    model = get_model(
        "gem_r50", backbone_name="resnet18", outputdim=16, num_classes=4
    )
    init = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), init, labels=jnp.zeros((1,), jnp.int32),
        train=False,
    )
    masked = lambda x, v: model.apply(variables, x, v, method="extract")

    rng = np.random.default_rng(7)
    # 7 images over 3 buckets with batch_size=2 -> partial tail batches
    # in multiple buckets, interleaved arrival order
    sizes = [(40, 40), (70, 40), (40, 70), (40, 40), (70, 40), (40, 40),
             (70, 70)]
    imgs = [rng.standard_normal((h, w, 3)).astype(np.float32)
            for h, w in sizes]
    scales = (1.0, 2**-0.5)

    sync = extract_vectors(masked, imgs, scales=scales, bucket=32,
                           batch_size=2, pipeline_depth=0)
    for depth in (1, 3):
        got = extract_vectors(masked, iter(imgs), scales=scales, bucket=32,
                              batch_size=2, pipeline_depth=depth)
        np.testing.assert_allclose(got, sync, atol=1e-6)


def test_empty_iterable_returns_empty():
    got = extract_vectors(lambda x, v: jnp.zeros((x.shape[0], 4)), iter([]),
                          outputdim=4)
    assert got.shape == (0, 4)


def test_mesh_sharded_extraction_matches_single_device(rng):
    """Data-parallel bucketed extraction over the 8-device mesh equals the
    single-device path bit-for-bit (same program, sharded batch)."""
    import jax

    from research_image_retrieval_tpu.models import get_model
    from research_image_retrieval_tpu.parallel import make_mesh

    model = get_model("gem_r50", backbone_name="resnet18", outputdim=16,
                      num_classes=4,)
    im0 = rng.standard_normal((40, 40, 3)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(im0[None]),
        labels=jnp.zeros((1,), jnp.int32), train=False,
    )
    fn = lambda x, valid_hw: model.apply(variables, x, valid_hw,
                                         method="extract")
    images = [rng.standard_normal((40 + 3 * i, 40, 3)).astype(np.float32)
              for i in range(6)]

    single = extract_vectors(fn, images, bucket=32, batch_size=8)
    mesh = make_mesh(data=8, model=1)
    sharded = extract_vectors(fn, images, bucket=32, batch_size=8, mesh=mesh)
    np.testing.assert_allclose(sharded, single, atol=1e-6)


def test_async_dispatcher_surfaces_worker_errors(rng):
    """An extract_fn that dies inside the dispatcher thread must raise
    on the FEEDING thread (not hang or silently drop images)."""
    import pytest

    from research_image_retrieval_tpu.index import extract_vectors

    def bad_fn(x, valid_hw):
        raise RuntimeError("boom in dispatch")

    images = [rng.standard_normal((40, 40, 3)).astype(np.float32)
              for _ in range(4)]
    with pytest.raises(RuntimeError, match="boom in dispatch"):
        extract_vectors(bad_fn, images, bucket=32, batch_size=2)


def test_sync_dispatch_path_still_equal(rng):
    """async_dispatch=False (the in-line path) matches the threaded
    default bit-for-bit."""
    from research_image_retrieval_tpu.index.extract import _AccumStream

    def fn(x, valid_hw):
        from research_image_retrieval_tpu.ops import (
            gem_pool,
            hw_mask,
            l2_normalize,
        )

        mask = hw_mask(x.shape[1], x.shape[2], valid_hw)
        return l2_normalize(gem_pool(jnp.abs(x) + 0.1, p=3.0,
                                     valid_hw=mask))

    images = [rng.standard_normal((30 + 5 * i, 40, 3)).astype(np.float32)
              for i in range(5)]
    out = {}
    for mode in (True, False):
        s = _AccumStream(fn, bucket=32, batch_size=2, async_dispatch=mode)
        for i, im in enumerate(images):
            s.add(i, im)
        out[mode] = s.finish()
    np.testing.assert_array_equal(out[True], out[False])
