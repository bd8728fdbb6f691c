"""Parity tests for descriptor ops against independently written torch oracles.

The oracles implement the published math (GeM / ArcFace / MadaCos / PCA
whitening) directly in torch; agreement at fp32 tolerances is the numerics
gate for the compute core.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax.numpy as jnp

from research_image_retrieval_tpu.ops import (
    apply_whitening,
    arcface_delg_logits,
    arcface_logits,
    cross_entropy,
    gem_pool,
    l2_normalize,
    madacos_loss,
    pca_whiten_learn,
    spoc_pool,
    topk_errors,
)


def torch_gem(x_nchw, p=3.0, eps=1e-6):
    return tF.avg_pool2d(
        x_nchw.clamp(min=eps).pow(p), (x_nchw.size(-2), x_nchw.size(-1))
    ).pow(1.0 / p)


class TestPooling:
    def test_gem_matches_torch(self, rng):
        x = rng.standard_normal((2, 7, 9, 16)).astype(np.float32)
        ours = np.asarray(gem_pool(jnp.asarray(x), p=3.0))
        theirs = torch_gem(torch.from_numpy(x).permute(0, 3, 1, 2))
        np.testing.assert_allclose(
            ours, theirs.squeeze(-1).squeeze(-1).numpy(), rtol=2e-5, atol=1e-6
        )

    def test_gem_p1_is_spoc(self, rng):
        x = np.abs(rng.standard_normal((2, 4, 4, 8))).astype(np.float32) + 0.1
        np.testing.assert_allclose(
            np.asarray(gem_pool(jnp.asarray(x), p=1.0)),
            np.asarray(spoc_pool(jnp.asarray(x))),
            rtol=1e-5,
        )

    def test_masked_gem_equals_cropped(self, rng):
        """Padding a feature map and masking must equal pooling the crop."""
        x = rng.standard_normal((1, 5, 6, 8)).astype(np.float32)
        pad = np.zeros((1, 8, 8, 8), dtype=np.float32)
        pad[:, :5, :6, :] = x
        mask = np.zeros((1, 8, 8), dtype=np.float32)
        mask[:, :5, :6] = 1.0
        np.testing.assert_allclose(
            np.asarray(gem_pool(jnp.asarray(pad), p=3.0, valid_hw=jnp.asarray(mask))),
            np.asarray(gem_pool(jnp.asarray(x), p=3.0)),
            rtol=1e-5,
            atol=1e-6,
        )


class TestNorm:
    def test_matches_torch(self, rng):
        x = rng.standard_normal((4, 32)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(l2_normalize(jnp.asarray(x))),
            tF.normalize(torch.from_numpy(x), p=2.0, dim=-1).numpy(),
            rtol=1e-6,
            atol=1e-7,
        )

    def test_zero_vector_stays_zero(self):
        out = np.asarray(l2_normalize(jnp.zeros((1, 8))))
        assert np.all(np.isfinite(out)) and np.allclose(out, 0.0)


class TestWhitening:
    def test_whitened_covariance_is_identity(self, rng):
        X = rng.standard_normal((500, 16)) @ rng.standard_normal((16, 16))
        m, P = pca_whiten_learn(X, s=1.0)
        Y = np.asarray(apply_whitening(jnp.asarray(X, dtype=jnp.float32), m, P))
        cov = (Y - Y.mean(0)).T @ (Y - Y.mean(0)) / X.shape[0]
        np.testing.assert_allclose(cov, np.eye(16), atol=0.15)

    def test_truncation(self, rng):
        X = rng.standard_normal((100, 16)).astype(np.float32)
        m, P = pca_whiten_learn(X)
        out = apply_whitening(jnp.asarray(X), m, P, out_dim=4)
        assert out.shape == (100, 4)
        full = apply_whitening(jnp.asarray(X), m, P)
        np.testing.assert_allclose(np.asarray(out), np.asarray(full)[:, :4], rtol=1e-5)

    def test_shrinkage_changes_spectrum(self, rng):
        X = rng.standard_normal((300, 8)) * np.arange(1, 9)
        _, P1 = pca_whiten_learn(X, s=1.0)
        _, P0 = pca_whiten_learn(X, s=0.5)
        assert not np.allclose(P1, P0)


def torch_arcface(features, weight, labels, s, m, eps=1e-6):
    cos = tF.linear(tF.normalize(features, dim=-1), tF.normalize(weight, dim=-1))
    theta = torch.acos(torch.clamp(cos, -1 + eps, 1 - eps))
    one_hot = torch.zeros_like(cos)
    one_hot.scatter_(1, labels.view(-1, 1), 1)
    selected = torch.where(
        theta > (math.pi - m), torch.zeros_like(one_hot), one_hot
    ).bool()
    return torch.cos(torch.where(selected, theta + m, theta)) * s


class TestArcFace:
    def test_matches_torch(self, rng):
        B, D, C = 8, 16, 10
        f = rng.standard_normal((B, D)).astype(np.float32)
        w = rng.standard_normal((C, D)).astype(np.float32)
        y = rng.integers(0, C, B)
        ours = np.asarray(
            arcface_logits(jnp.asarray(f), jnp.asarray(w), jnp.asarray(y), s=32.0, m=0.15)
        )
        theirs = torch_arcface(
            torch.from_numpy(f), torch.from_numpy(w), torch.from_numpy(y), 32.0, 0.15
        )
        np.testing.assert_allclose(ours, theirs.numpy(), rtol=2e-4, atol=2e-5)

    def test_margin_increases_target_loss(self, rng):
        B, D, C = 4, 8, 5
        f = rng.standard_normal((B, D)).astype(np.float32)
        w = rng.standard_normal((C, D)).astype(np.float32)
        y = rng.integers(0, C, B)
        with_m = arcface_logits(jnp.asarray(f), jnp.asarray(w), jnp.asarray(y), s=1.0, m=0.3)
        no_m = arcface_logits(jnp.asarray(f), jnp.asarray(w), jnp.asarray(y), s=1.0, m=0.0)
        tgt_with = np.take_along_axis(np.asarray(with_m), y[:, None], 1)
        tgt_no = np.take_along_axis(np.asarray(no_m), y[:, None], 1)
        assert np.all(tgt_with <= tgt_no + 1e-6)


def torch_arcface_delg(features, weight, labels, t0, s, m, eps=1e-6):
    cos_m, sin_m = math.cos(m), math.sin(m)
    threshold = math.cos(math.pi - m)
    mm = math.sin(math.pi - m) * m
    cos = tF.linear(tF.normalize(features, dim=-1), tF.normalize(weight, dim=-1))
    cos = cos.clamp(-1 + eps, 1 - eps)
    target = cos[torch.arange(features.size(0)), labels].view(-1, 1)
    sin = torch.sqrt(1.0 - target.pow(2))
    cos_theta_m = target * cos_m - sin * sin_m
    mask = cos > cos_theta_m
    final_target = torch.where(target > threshold, cos_theta_m, target - mm)
    t = target.mean() * 0.01 + 0.99 * t0
    out = cos.clone()
    out[mask] = cos[mask] * (t + cos[mask])
    out.scatter_(1, labels.view(-1, 1).long(), final_target)
    return out * s, t


class TestArcFaceDelg:
    def test_matches_torch(self, rng):
        B, D, C = 8, 16, 12
        f = rng.standard_normal((B, D)).astype(np.float32)
        w = rng.standard_normal((C, D)).astype(np.float32)
        y = rng.integers(0, C, B)
        ours, new_t = arcface_delg_logits(
            jnp.asarray(f), jnp.asarray(w), jnp.asarray(y),
            t_state=jnp.zeros((1,)), s=30.0, m=0.2,
        )
        theirs, t_torch = torch_arcface_delg(
            torch.from_numpy(f), torch.from_numpy(w), torch.from_numpy(y),
            torch.zeros(1), 30.0, 0.2,
        )
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(new_t), t_torch.numpy().ravel(), rtol=1e-5)


def torch_madacos(features, weight, labels, rho=0.04, t=0.1, sigma=0.1):
    feats = tF.normalize(features, p=2, dim=1)
    w = tF.normalize(weight, p=2, dim=1)
    cos = tF.linear(feats, w)
    target = cos.gather(1, labels.view(-1, 1)).squeeze(1)
    median = torch.median(target).item()
    scale = math.log((1 - t) * (1 - rho) / sigma) / (1 - median + 1e-8)
    mean_cos = torch.mean(target).item()
    mask = torch.ones_like(cos).scatter_(1, labels.view(-1, 1), 0)
    exp_sum = torch.sum(torch.exp(scale * cos * mask), dim=1).mean().item()
    margin = mean_cos - 0.5 * math.log(rho * exp_sum / (1 - rho) + 1e-8)
    margin = max(0.0, min(margin, 1.0))
    logits = scale * cos
    logits.scatter_(1, labels.view(-1, 1), (scale * (target - margin)).view(-1, 1))
    return tF.cross_entropy(logits, labels), scale, margin


class TestMadaCos:
    def test_matches_torch(self, rng):
        B, D, C = 16, 32, 50
        f = rng.standard_normal((B, D)).astype(np.float32)
        w = rng.standard_normal((C, D)).astype(np.float32)
        y = rng.integers(0, C, B)
        loss, aux = madacos_loss(jnp.asarray(f), jnp.asarray(w), jnp.asarray(y))
        t_loss, t_scale, t_margin = torch_madacos(
            torch.from_numpy(f), torch.from_numpy(w), torch.from_numpy(y)
        )
        assert float(aux["scale"]) == pytest.approx(t_scale, rel=1e-4)
        assert float(aux["margin"]) == pytest.approx(t_margin, rel=1e-3, abs=1e-4)
        assert float(loss) == pytest.approx(t_loss.item(), rel=1e-4)

    def test_gradient_flows(self, rng):
        import jax

        B, D, C = 8, 16, 10
        f = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((C, D)).astype(np.float32))
        y = jnp.asarray(rng.integers(0, C, B))
        g = jax.grad(lambda ff: madacos_loss(ff, w, y)[0])(f)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).sum()) > 0


class TestCrossEntropyAndErrors:
    def test_ce_matches_torch(self, rng):
        logits = rng.standard_normal((8, 20)).astype(np.float32)
        y = rng.integers(0, 20, 8)
        ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(y)))
        theirs = tF.cross_entropy(torch.from_numpy(logits), torch.from_numpy(y)).item()
        assert ours == pytest.approx(theirs, rel=1e-5)

    def test_topk_errors(self):
        logits = jnp.asarray(
            np.array([[5.0, 1.0, 0.0], [4.0, 5.0, 1.0], [0.0, 1.0, 5.0]], np.float32)
        )
        y = jnp.asarray(np.array([0, 0, 2]))
        e1, e2 = topk_errors(logits, y, ks=(1, 2))
        assert float(e1) == pytest.approx(100.0 / 3)
        assert float(e2) == pytest.approx(0.0)
