"""Generic contract tests over every registered model.

Each model must satisfy the dual API (SURVEY.md section 1): train forward
returns a finite loss with flowing gradients; extract returns unit-norm
descriptors of the declared dimension.  New registrations get covered
automatically.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.models import (
    get_model,
    get_model_info,
    list_available_models,
)

# small-config overrides so every model runs quickly on CPU
SMALL = dict(backbone_name="resnet18", num_classes=8)
PER_MODEL_SMALL = {
    "gem": dict(outputdim=32),
    "token": dict(outputdim=64),
    "solar": dict(outputdim=32),
    "dolg": dict(outputdim=32),
    "delg": dict(outputdim=32, local_dim=16),
    "how": dict(outputdim=32, local_dim=16, num_clusters=8),
    "how_asmk": dict(outputdim=32, local_dim=16, num_clusters=8),
    "sosnet": dict(outputdim=32, second_order_dim=16),
    "spoc": dict(outputdim=32, context_dim=16),
    # scratch SE-ResNet: no backbone_name field
    "senet_g2": dict(backbone_name=None, layers=(1, 1, 1, 1), outputdim=32),
    "spca": dict(outputdim=32, K=4, local_dim=8, multi=2, mediumdim=512),
    # tiny hybrid: no backbone_name field; 64px input -> 16x16 patches
    "ultron": dict(backbone_name=None, variant="t", img_size=64, window_size=4),
    "adaptive_hybrid": dict(outputdim=32),
    "vit": dict(backbone_name=None, variant="test", outputdim=32, img_size=64),
    "clip_vit": dict(backbone_name=None, variant="test", outputdim=32, img_size=64),
    "clip_rn": dict(backbone_name=None, variant="rtest", outputdim=24, img_size=64),
    "iris": dict(outputdim=32),
    "sparse": dict(outputdim=32),
    "hamlet": dict(outputdim=32, hidden=16),
    "spectrum": dict(outputdim=32),
}
# one representative per family (families share the module)
REPRESENTATIVES = sorted(
    {get_model_info(n)["family"] or n: n for n in list_available_models()}.values()
)


def build_small(name):
    info = get_model_info(name)
    overrides = {**SMALL, **PER_MODEL_SMALL.get(info["family"], {})}
    overrides = {k: v for k, v in overrides.items() if v is not None}
    if info["family"] == "senet_g2":
        overrides.pop("backbone_name", None)
    return get_model(name, **overrides)


@pytest.mark.parametrize("name", REPRESENTATIVES)
class TestModelContract:
    def _init(self, model):
        x = jnp.zeros((2, 64, 64, 3))
        y = jnp.zeros((2,), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), x, labels=y, train=False)
        return variables

    def test_train_forward_and_grads(self, name, rng):
        model = build_small(name)
        variables = self._init(model)
        x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
        y = jnp.asarray(np.array([1, 5]))

        def loss_fn(params):
            (loss, logits), _ = model.apply(
                {"params": params, **{k: v for k, v in variables.items() if k != "params"}},
                x, labels=y, train=True,
                mutable=["batch_stats", "model_state"],
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        assert np.isfinite(float(loss)), name
        assert logits.shape == (2, 8)
        total = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
        assert np.isfinite(total) and total > 0, name

    def test_extract_unit_norm(self, name, rng):
        model = build_small(name)
        variables = self._init(model)
        x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
        d = model.apply(variables, x, method="extract")
        assert d.ndim == 2 and d.shape[0] == 2
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(d), axis=1), 1.0, rtol=1e-4
        )

    def test_extract_deterministic(self, name, rng):
        model = build_small(name)
        variables = self._init(model)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
        d1 = model.apply(variables, x, method="extract")
        d2 = model.apply(variables, x, method="extract")
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


class TestUltronBf16:
    """ULTRON's dtype knob: bf16 backbone compute must track fp32 closely
    (descriptor head stays fp32 by construction) and reuse fp32 params."""

    def test_bf16_close_to_fp32(self, rng):
        import jax
        import jax.numpy as jnp

        from research_image_retrieval_tpu.models import get_model

        kw = dict(variant="t", img_size=64, window_size=4, num_classes=8)
        m32 = get_model("ultron_s", **kw)
        m16 = get_model("ultron_s", dtype=jnp.bfloat16, **kw)
        x = jnp.asarray(
            rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        )
        v = m32.init(jax.random.PRNGKey(0), x,
                     labels=jnp.zeros((2,), jnp.int32), train=False)
        d32 = m32.apply(v, x, method="extract")
        d16 = m16.apply(v, x, method="extract")  # same fp32 params
        assert d16.dtype == jnp.float32  # descriptor head is fp32
        cos = np.sum(np.asarray(d32) * np.asarray(d16), axis=1)
        assert (cos > 0.98).all(), cos

    def test_bf16_trains(self, rng):
        import jax
        import jax.numpy as jnp

        from research_image_retrieval_tpu.models import get_model

        m = get_model("ultron_s", dtype=jnp.bfloat16, variant="t",
                      img_size=64, window_size=4, num_classes=8)
        x = jnp.asarray(
            rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        )
        y = jnp.asarray([1, 3])
        v = m.init(jax.random.PRNGKey(0), x, labels=y, train=True)

        def loss_fn(params):
            (loss, _), _ = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, labels=y, train=True, mutable=["batch_stats"],
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(v["params"])
        assert np.isfinite(float(loss))
        gnorm = sum(
            float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads)
        )
        assert np.isfinite(gnorm) and gnorm > 0


class TestTransformerBf16:
    """The ViT/CLIP towers' dtype knob: bf16 tower compute must track the
    fp32 descriptors closely while reusing the same fp32 params (the knob
    was previously declared on ViTGlobalModel but never threaded into the
    tower — this pins the actual wiring)."""

    CASES = {
        "vit_s16": dict(variant="test", outputdim=32, img_size=64),
        "clip_vit_b32": dict(variant="test", outputdim=32, img_size=64),
        "clip_r50": dict(variant="rtest", outputdim=24, img_size=64),
    }

    @pytest.mark.parametrize("name", sorted(CASES))
    def test_bf16_close_to_fp32(self, name, rng):
        kw = {**self.CASES[name], "num_classes": 8}
        m32 = get_model(name, **kw)
        m16 = get_model(name, dtype=jnp.bfloat16, **kw)
        x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
        v = m32.init(jax.random.PRNGKey(0), x,
                     labels=jnp.zeros((2,), jnp.int32), train=False)
        d32 = m32.apply(v, x, method="extract")
        d16 = m16.apply(v, x, method="extract")  # same fp32 params
        assert d16.dtype == jnp.float32  # descriptor head is fp32
        cos = np.sum(np.asarray(d32) * np.asarray(d16), axis=1)
        assert (cos > 0.98).all(), (name, cos)

    @pytest.mark.parametrize("name", sorted(CASES))
    def test_bf16_trains(self, name, rng):
        kw = {**self.CASES[name], "num_classes": 8}
        m = get_model(name, dtype=jnp.bfloat16, **kw)
        x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
        y = jnp.asarray([1, 3])
        v = m.init(jax.random.PRNGKey(0), x, labels=y, train=True)
        rest = {k: val for k, val in v.items() if k != "params"}

        def loss_fn(params):
            (loss, _), _ = m.apply(
                {"params": params, **rest}, x, labels=y, train=True,
                mutable=["batch_stats", "model_state"],
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(v["params"])
        assert np.isfinite(float(loss))
        gnorm = sum(
            float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads)
        )
        assert np.isfinite(gnorm) and gnorm > 0
