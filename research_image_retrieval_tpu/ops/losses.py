"""Margin-based classification losses as pure functions.

Functional re-derivations of the reference's loss modules, restructured for
JAX: classifier weights and EMA state are explicit arguments/returns rather
than module attributes, so the losses compose with pjit (the 81313-way
GLDv2 classifier weight is sharded across the mesh by the train loop).

Behavioral contracts:
  arcface_logits       — reference networks/RetrievalNet.py:190-215
  arcface_delg_logits  — reference networks/RetrievalNet.py:217-260
                         (fp32 here instead of the reference's fp16
                         constants; TPU prefers bf16/fp32)
  madacos_loss         — reference models/ultron_modules/madacos_loss.py:14-115
                         (ULTRON paper eqs 13-15); the adaptive scale and
                         margin are statistics, not gradient paths, so they
                         are wrapped in stop_gradient exactly where the
                         reference used .item().
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.ops.norm import l2_normalize

__all__ = [
    "arcface_logits",
    "arcface_delg_logits",
    "madacos_loss",
    "cross_entropy",
    "topk_errors",
]


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross entropy with integer labels (fp32 accumulation)."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    target = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(logz - target)


def arcface_logits(
    features: jnp.ndarray,
    weight: jnp.ndarray,
    labels: jnp.ndarray,
    s: float = 64.0,
    m: float = 0.50,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Additive angular margin (ArcFace) logits.

    Args:
      features: [B, D] descriptors (normalized internally).
      weight: [num_classes, D] classifier weight (normalized internally).
      labels: [B] int class ids.
      s: logit scale.  m: angular margin (radians).

    The margin is applied only to the target class, and only when
    ``theta <= pi - m`` (otherwise adding the margin would wrap the angle).
    """
    cos_theta = jnp.matmul(
        l2_normalize(features.astype(jnp.float32), axis=-1),
        l2_normalize(weight.astype(jnp.float32), axis=-1).T,
        preferred_element_type=jnp.float32,
    )
    theta = jnp.arccos(jnp.clip(cos_theta, -1.0 + eps, 1.0 - eps))
    one_hot = jax.nn.one_hot(labels, weight.shape[0], dtype=jnp.bool_)
    selected = jnp.where(theta > (math.pi - m), False, one_hot)
    logits = jnp.cos(jnp.where(selected, theta + m, theta))
    return logits * s


def arcface_delg_logits(
    features: jnp.ndarray,
    weight: jnp.ndarray,
    labels: jnp.ndarray,
    t_state: jnp.ndarray,
    s: float = 64.0,
    m: float = 0.50,
    eps: float = 1e-6,
):
    """DELG-style ArcFace with hard-example rescaling and an EMA buffer.

    cos-algebra margin variant: ``cos(theta + m)`` is computed as
    ``cos*cos_m - sin*sin_m``; target logits below the ``cos(pi - m)``
    threshold fall back to the linear penalty ``cos - sin(pi-m)*m``.
    Non-target logits above the margined target ("hard examples") are
    rescaled by ``(t + cos) * cos`` where ``t`` is an EMA of the mean
    target cosine.

    Returns:
      (logits [B, C], new_t_state [1]) — thread ``new_t_state`` through the
      train step (the reference mutates a module buffer instead).
    """
    cos_m, sin_m = math.cos(m), math.sin(m)
    threshold = math.cos(math.pi - m)
    mm = math.sin(math.pi - m) * m

    cos_theta = jnp.matmul(
        l2_normalize(features.astype(jnp.float32), axis=-1),
        l2_normalize(weight.astype(jnp.float32), axis=-1).T,
        preferred_element_type=jnp.float32,
    )
    cos_theta = jnp.clip(cos_theta, -1.0 + eps, 1.0 - eps)

    target_logit = jnp.take_along_axis(cos_theta, labels[:, None], axis=1)  # [B,1]
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - target_logit**2, 0.0))
    cos_theta_m = target_logit * cos_m - sin_theta * sin_m

    new_t = jax.lax.stop_gradient(
        jnp.mean(target_logit) * 0.01 + 0.99 * t_state.reshape(())
    ).reshape((1,))

    hard_mask = cos_theta > cos_theta_m
    rescaled = cos_theta * (new_t[0] + cos_theta)
    out = jnp.where(hard_mask, rescaled, cos_theta)

    final_target = jnp.where(
        target_logit > threshold, cos_theta_m, target_logit - mm
    )
    one_hot = jax.nn.one_hot(labels, weight.shape[0], dtype=jnp.bool_)
    out = jnp.where(one_hot, final_target, out)
    return out * s, new_t


def madacos_loss(
    features: jnp.ndarray,
    weight: jnp.ndarray,
    labels: jnp.ndarray,
    rho: float = 0.04,
    t: float = 0.1,
    sigma: float = 0.1,
    fixed_scale: float | None = None,
    fixed_margin: float | None = None,
):
    """Margin-adaptive cosine (MadaCos) loss — ULTRON eqs (13)-(15).

    scale  s = log((1-t)(1-rho)/sigma) / (1 - median(target_cos))
    margin m = mean(target_cos) - 0.5*log(rho * E[sum_j exp(s*cos_j)] / (1-rho))
               clamped to [0, 1]
    loss     = CE over logits where the target entry is s*(target_cos - m)
               and non-target entries are s*cos.

    Scale/margin are batch statistics with no gradient path (the reference
    computed them via ``.item()``).

    Returns:
      (loss, aux) where aux = {"scale": s, "margin": m, "logits": logits}.
    """
    feats = l2_normalize(features.astype(jnp.float32), axis=-1)
    w = l2_normalize(weight.astype(jnp.float32), axis=-1)
    cos = jnp.matmul(feats, w.T, preferred_element_type=jnp.float32)
    target_cos = jnp.take_along_axis(cos, labels[:, None], axis=1)[:, 0]  # [B]

    if fixed_scale is not None:
        scale = jnp.asarray(fixed_scale, jnp.float32)
    else:
        # lower median (torch.median semantics, used by the reference) —
        # jnp.median would average the two middle values on even batches
        n = target_cos.shape[0]
        median = jax.lax.stop_gradient(jnp.sort(target_cos)[(n - 1) // 2])
        scale = math.log((1.0 - t) * (1.0 - rho) / sigma) / (1.0 - median + 1e-8)

    if fixed_margin is not None:
        margin = jnp.asarray(fixed_margin, jnp.float32)
    else:
        mean_cos = jax.lax.stop_gradient(jnp.mean(target_cos))
        one_hot = jax.nn.one_hot(labels, weight.shape[0], dtype=cos.dtype)
        # reference zeroes the target column *before* exp, so the target
        # contributes exp(0)=1 to each row's sum (madacos_loss.py:85-87)
        neg_cos = jax.lax.stop_gradient(cos) * (1.0 - one_hot)
        exp_sum = jnp.mean(jnp.sum(jnp.exp(scale * neg_cos), axis=1))
        margin = mean_cos - 0.5 * jnp.log(rho * exp_sum / (1.0 - rho) + 1e-8)
        margin = jnp.clip(margin, 0.0, 1.0)

    target_entry = scale * (target_cos - margin)
    one_hot_b = jax.nn.one_hot(labels, weight.shape[0], dtype=jnp.bool_)
    logits = jnp.where(one_hot_b, target_entry[:, None], scale * cos)
    loss = cross_entropy(logits, labels)
    return loss, {"scale": scale, "margin": margin, "logits": logits}


def topk_errors(logits: jnp.ndarray, labels: jnp.ndarray, ks=(1, 5)):
    """Top-k error percentages (reference: spca_train.py:21-35).

    k is clamped to the class count so debug heads with fewer than
    max(ks) classes still report (top-C error, i.e. 0 when the label
    space is exhausted) instead of crashing.
    """
    ks = tuple(min(k, logits.shape[-1]) for k in ks)
    max_k = max(ks)
    _, top_idx = jax.lax.top_k(logits, max_k)  # [B, max_k]
    correct = top_idx == labels[:, None]
    errors = []
    for k in ks:
        acc = jnp.any(correct[:, :k], axis=1).astype(jnp.float32).mean()
        errors.append((1.0 - acc) * 100.0)
    return errors
