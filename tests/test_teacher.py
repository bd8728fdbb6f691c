"""Offline text teacher (data/teacher.py) + teacher_table step wiring.

The reference runs a frozen DistilBERT INSIDE every train forward
(manus/1_SPARSE/sparse_model.py:91-97).  Here the teacher runs once on
the host producing a [num_classes, text_dim] table, and the jitted train
step gathers rows by label (train/loop.make_train_step(teacher_table=)).
These tests pin: the fallback teacher is deterministic and text-
sensitive, the table plumbs through train/eval steps (loss actually
changes, distill grads flow), and the driver helper validates its
inputs.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from research_image_retrieval_tpu.data.teacher import (
    TextTeacher,
    default_label_texts,
    load_label_texts,
)

TINY = dict(n_layers=1, dim=32, hidden_dim=64, n_heads=2)


def _tiny_teacher(seed=0):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return TextTeacher("this-model-does-not-exist", max_length=16,
                           seed=seed, config_overrides=TINY,
                           allow_random_init=True)


class TestTextTeacher:
    def test_fallback_warns_and_reports_dim(self):
        with pytest.warns(UserWarning, match="RANDOM-INIT"):
            t = TextTeacher("this-model-does-not-exist", max_length=16,
                            config_overrides=TINY, allow_random_init=True)
        assert not t.pretrained
        assert t.text_dim == TINY["dim"]

    def test_missing_model_hard_errors_without_opt_in(self):
        with pytest.raises(RuntimeError, match="allow_random_init"):
            TextTeacher("this-model-does-not-exist", max_length=16,
                        config_overrides=TINY)

    def test_encode_shape_and_determinism(self):
        texts = ["a photo of landmark 0", "the eiffel tower at night"]
        a = _tiny_teacher().encode(texts)
        b = _tiny_teacher().encode(texts)  # fresh instance, same seed
        assert a.shape == (2, TINY["dim"]) and a.dtype == np.float32
        np.testing.assert_array_equal(a, b)

    def test_distinct_texts_distinct_embeddings(self):
        t = _tiny_teacher()
        e = t.encode(["red brick cathedral", "snowy mountain pass"])
        assert np.abs(e[0] - e[1]).max() > 1e-4

    def test_batching_invariance(self):
        t = _tiny_teacher()
        texts = [f"landmark number {i}" for i in range(5)]
        np.testing.assert_allclose(
            t.encode(texts, batch_size=2), t.encode(texts, batch_size=64),
            rtol=0, atol=1e-6)

    def test_class_table_matches_encode(self):
        t = _tiny_teacher()
        texts = default_label_texts(3)
        np.testing.assert_array_equal(t.class_table(texts), t.encode(texts))

    def test_label_text_helpers(self, tmp_path):
        texts = default_label_texts(4)
        assert texts[2] == "a photo of landmark 2"
        p = tmp_path / "labels.txt"
        p.write_text("\n".join(texts) + "\n")
        assert load_label_texts(str(p), 4) == texts
        with pytest.raises(ValueError, match="expected 3"):
            load_label_texts(str(p), 3)


class TestTeacherTableStep:
    """teacher_table -> on-device gather -> distillation loss in the
    jitted train/eval steps."""

    def _setup(self, rng, text_dim=48, num_classes=4):
        from research_image_retrieval_tpu.models import get_model
        from research_image_retrieval_tpu.train.loop import (
            create_train_state,
            make_eval_step,
            make_train_step,
        )
        from research_image_retrieval_tpu.train.optimizer import (
            make_sgd_optimizer,
        )

        model = get_model("sparse_r50", backbone_name="resnet18",
                          outputdim=24, num_classes=num_classes,
                          distill_dim=16, text_dim=text_dim)
        x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)), jnp.float32)
        labels = jnp.asarray([0, 1, 2, 3], jnp.int32)
        table = rng.standard_normal((num_classes, text_dim)).astype(
            np.float32)
        tx = make_sgd_optimizer(1e-2)
        state = create_train_state(model, jax.random.PRNGKey(0), x, labels,
                                   tx)
        steps = (make_train_step, make_eval_step)
        return model, tx, state, x, labels, table, steps

    def test_teacher_table_changes_train_loss(self, rng):
        from research_image_retrieval_tpu.train.loop import make_train_step

        model, tx, state, x, labels, table, _ = self._setup(rng)
        _, m_plain = make_train_step(model, tx, donate=False)(
            state, x, labels)
        _, m_teach = make_train_step(model, tx, donate=False,
                                     teacher_table=table)(state, x, labels)
        lp, lt = float(m_plain["loss"]), float(m_teach["loss"])
        assert np.isfinite(lp) and np.isfinite(lt)
        assert lt != lp, "teacher table must add a distillation term"

    def test_gather_matches_explicit_text_features(self, rng):
        """step-with-table == model.apply with text_features=table[labels]
        (the gather is the ONLY thing the table adds)."""
        from research_image_retrieval_tpu.train.loop import make_train_step

        model, tx, state, x, labels, table, _ = self._setup(rng)
        _, metrics = make_train_step(model, tx, donate=False,
                                     teacher_table=table)(state, x, labels)
        (ref_loss, _), _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, labels, train=True,
            text_features=jnp.asarray(table)[labels],
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.split(state.rng)[1]},
        )
        np.testing.assert_allclose(float(metrics["loss"]), float(ref_loss),
                                   rtol=1e-5)

    def test_eval_step_takes_table(self, rng):
        from research_image_retrieval_tpu.train.loop import make_eval_step

        model, tx, state, x, labels, table, _ = self._setup(rng)
        m = make_eval_step(model, teacher_table=table)(state, x, labels)
        m0 = make_eval_step(model)(state, x, labels)
        assert np.isfinite(float(m["loss"]))
        assert float(m["loss"]) != float(m0["loss"])


class TestHamletTeacher:
    """HAMLET's distillation path (P2): student text_head projects into
    teacher space; frozen teacher stays the fixed MSE target."""

    def _model(self, text_dim=48):
        from research_image_retrieval_tpu.models import get_model

        return get_model("hamlet_r50", backbone_name="resnet18",
                         outputdim=24, hidden=16, num_classes=4,
                         text_dim=text_dim)

    def test_param_tree_identical_with_and_without_teacher(self, rng):
        model = self._model()
        x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
        labels = jnp.zeros((2,), jnp.int32)
        teacher = jnp.asarray(rng.standard_normal((2, 48)), jnp.float32)
        va = model.init(jax.random.PRNGKey(0), x, labels, train=False)
        vb = model.init(jax.random.PRNGKey(0), x, labels, train=False,
                        text_features=teacher)
        assert (jax.tree_util.tree_structure(va["params"])
                == jax.tree_util.tree_structure(vb["params"]))

    def test_teacher_table_train_step(self, rng):
        from research_image_retrieval_tpu.train.loop import (
            create_train_state,
            make_train_step,
        )
        from research_image_retrieval_tpu.train.optimizer import (
            make_sgd_optimizer,
        )

        model = self._model()
        x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)), jnp.float32)
        labels = jnp.asarray([0, 1, 2, 3], jnp.int32)
        table = rng.standard_normal((4, 48)).astype(np.float32)
        tx = make_sgd_optimizer(1e-2)
        # init WITHOUT a teacher, step WITH one (resume-with-teacher path)
        state = create_train_state(model, jax.random.PRNGKey(0), x, labels,
                                   tx)
        _, m0 = make_train_step(model, tx, donate=False)(state, x, labels)
        _, m1 = make_train_step(model, tx, donate=False,
                                teacher_table=table)(state, x, labels)
        assert np.isfinite(float(m1["loss"]))
        assert float(m1["loss"]) != float(m0["loss"])

    def test_teacher_gradient_reaches_text_head_only_with_teacher(self, rng):
        model = self._model()
        x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
        labels = jnp.asarray([0, 1], jnp.int32)
        teacher = jnp.asarray(rng.standard_normal((2, 48)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, labels,
                               train=False)

        def loss_fn(params, tf):
            (loss, _), _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, labels, train=True, text_features=tf,
                mutable=["batch_stats"])
            return loss

        g = jax.grad(loss_fn)(variables["params"], teacher)
        gn = float(jnp.abs(g["text_head"]["kernel"]).sum())
        assert gn > 0
        g0 = jax.grad(lambda p: loss_fn(p, None))(variables["params"])
        assert float(jnp.abs(g0["text_head"]["kernel"]).sum()) == 0


class TestBuildTeacherTable:
    def test_rejects_non_distillation_model(self):
        from research_image_retrieval_tpu.models import get_model
        from research_image_retrieval_tpu.train.driver import (
            build_teacher_table,
        )
        from research_image_retrieval_tpu.utils.config import TrainConfig

        cfg = TrainConfig(model="gem_r50", teacher=True)
        model = get_model("gem_r50", backbone_name="resnet18",
                          num_classes=4)
        with pytest.raises(ValueError, match="text_features"):
            build_teacher_table(cfg, model, 4)
