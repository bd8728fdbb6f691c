"""Grid-aligned-extent contract for bucketed masked extraction.

Patch/window models (ViT, CLIP-ViT, ULTRON) compute their token grid as
``valid_hw // patch``; a non-multiple extent would silently drop boundary
content and shift the grid vs the exact-shape run.  The fix: models
advertise ``extent_multiple`` and ``extract_vectors`` snaps every task's
extents to the nearest multiple (one resize, no double resampling) before
bucketing.  These tests pin:

* the driver probe (_make_extract_fn) surfaces the model's multiple;
* extract_vectors on NON-multiple image sizes equals exact-shape
  extraction of the snapped images (descriptor identity, not just shape);
* conv models (multiple == 1) are untouched by the new path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from research_image_retrieval_tpu.index import extract_vectors
from research_image_retrieval_tpu.index.extract import (
    _snap,
    resize_bilinear_np,
)
from research_image_retrieval_tpu.models import get_model


def test_snap_nearest_positive_multiple():
    assert _snap(70, 8) == 72
    assert _snap(68, 8) == 64  # half-to-even via round(): 8.5 -> 8
    assert _snap(76, 8) == 80  # 9.5 -> 10
    assert _snap(67, 8) == 64
    assert _snap(3, 32) == 32  # never below one multiple
    assert _snap(96, 32) == 96  # aligned is a no-op


def _init(model, rng, size=96):
    im = rng.standard_normal((1, size, size, 3)).astype(np.float32)
    return model.init(
        jax.random.PRNGKey(0), jnp.asarray(im),
        labels=jnp.zeros((1,), jnp.int32), train=False,
    )


def _exact_on_snapped(model, variables, imgs, multiple):
    """Ground truth: snap each image's extents, run exact-shape extract."""
    out = []
    for img in imgs:
        h, w = _snap(img.shape[0], multiple), _snap(img.shape[1], multiple)
        if (h, w) != img.shape[:2]:
            img = resize_bilinear_np(img, h, w)
        out.append(
            np.asarray(
                model.apply(variables, jnp.asarray(img[None]),
                            method="extract")
            )[0]
        )
    return np.stack(out)


@pytest.mark.parametrize(
    "name,kw,multiple",
    [
        ("vit_s16", dict(variant="test", outputdim=32, img_size=64,
                         num_classes=4), 8),
        ("clip_vit_b32", dict(variant="test", outputdim=24, img_size=64,
                              num_classes=4), 8),
        ("ultron_s", dict(variant="t", img_size=64, window_size=4,
                          num_classes=4), 32),
    ],
)
def test_unaligned_sizes_match_exact_on_snapped(name, kw, multiple, rng):
    model = get_model(name, **kw)
    assert model.extent_multiple == multiple
    variables = _init(model, rng)

    # none of these extents are multiples of the model's grid
    sizes = [(70, 91), (61, 70), (87, 66)]
    imgs = [
        rng.standard_normal((h, w, 3)).astype(np.float32) for h, w in sizes
    ]

    masked = lambda x, valid_hw: model.apply(
        variables, x, valid_hw, method="extract"
    )
    got = extract_vectors(masked, imgs, bucket=32, batch_size=2,
                          extent_multiple=multiple)
    want = _exact_on_snapped(model, variables, imgs, multiple)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_unaligned_multiscale_matches_exact_on_snapped(rng):
    """Multi-scale with snapping: each scale task snaps independently and
    the per-image sum/renormalize must match the exact-shape pipeline run
    on the same snapped sizes."""
    from research_image_retrieval_tpu.ops import l2_normalize

    model = get_model("vit_s16", variant="test", outputdim=32, img_size=64,
                      num_classes=4)
    variables = _init(model, rng)
    multiple = model.extent_multiple
    scales = (1.0, 2 ** -0.5)

    imgs = [rng.standard_normal((h, w, 3)).astype(np.float32)
            for h, w in [(70, 91), (90, 62)]]
    masked = lambda x, valid_hw: model.apply(
        variables, x, valid_hw, method="extract"
    )
    got = extract_vectors(masked, imgs, scales=scales, bucket=32,
                          batch_size=2, extent_multiple=multiple)

    want = []
    for img in imgs:
        acc = None
        for s in scales:
            nh = _snap(int(np.floor(img.shape[0] * s)), multiple)
            nw = _snap(int(np.floor(img.shape[1] * s)), multiple)
            scaled = (img if (nh, nw) == img.shape[:2]
                      else resize_bilinear_np(img, nh, nw))
            v = np.asarray(
                model.apply(variables, jnp.asarray(scaled[None]),
                            method="extract")
            )[0]
            acc = v if acc is None else acc + v
        want.append(np.asarray(l2_normalize(jnp.asarray(acc / len(scales)))))
    np.testing.assert_allclose(got, np.stack(want), rtol=1e-4, atol=1e-5)


def test_driver_probe_surfaces_extent_multiple(rng):
    from research_image_retrieval_tpu.evaluation.driver import (
        _make_extract_fn,
    )

    model = get_model("vit_s16", variant="test", outputdim=32, img_size=64,
                      num_classes=4)
    variables = _init(model, rng)
    _, bucket, multiple = _make_extract_fn(model, variables, bucket=128)
    assert bucket == 128 and multiple == 8

    conv = get_model("gem_r50", backbone_name="resnet18", outputdim=16,
                     num_classes=4)
    im = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    cv = conv.init(jax.random.PRNGKey(0), jnp.asarray(im),
                   labels=jnp.zeros((1,), jnp.int32), train=False)
    _, bucket, multiple = _make_extract_fn(conv, cv, bucket=128)
    assert bucket == 128 and multiple == 1
