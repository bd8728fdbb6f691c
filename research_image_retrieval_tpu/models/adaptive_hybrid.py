"""AdaptiveHybrid: three GeM-family descriptors per image + QAFF fusion.

Behavioral contract of the reference prototype (reference:
manus/7_AdaptiveHybridModel/modified/adaptive_hybrid_retrieval_complete.py):

* SC-GeM — GeM-pooled global feature gated by a learned token (sigmoid MLP).
* Regional-GeM — GeM over a 2x2 grid, concat, projected.
* Scale-GeM — GeM at 1.0 and 0.5 scale, concat, projected.
* QAFF — query-adaptive fusion weights (MLP -> softmax over the 3 types)
  applied to gallery descriptor sets at search time (qaff: :295-345).
* InfoNCE-style contrastive training loss (:complete ContrastiveLoss).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.models.backbone import ResNet
from research_image_retrieval_tpu.models.registry import register_model
from research_image_retrieval_tpu.ops import gem_pool, l2_normalize

__all__ = ["AdaptiveHybridModel", "QAFF", "contrastive_loss"]


class QAFF(nn.Module):
    """Query-adaptive feature fusion (reference: ...complete.py:295-345)."""

    feature_dim: int
    num_feature_types: int = 3
    dropout: float = 0.1

    @nn.compact
    def __call__(self, query_feature, gallery_features, deterministic=True):
        """query_feature: [B, D]; gallery_features: list of [B, D]."""
        ln = nn.LayerNorm(epsilon=1e-5, name="layer_norm")
        q = ln(query_feature)
        h = nn.relu(nn.Dense(self.feature_dim // 2, name="wg_fc1")(q))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.relu(nn.Dense(self.feature_dim // 4, name="wg_fc2")(h))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        w = jax.nn.softmax(
            nn.Dense(self.num_feature_types, name="wg_fc3")(h), axis=-1
        )  # [B, T]
        fused = sum(
            w[:, i : i + 1] * ln(g) for i, g in enumerate(gallery_features)
        )
        return fused


def contrastive_loss(features, labels, temperature: float = 0.07):
    """InfoNCE-style supervised contrastive loss over a batch.

    Positives are same-label pairs (reference ContrastiveLoss semantics).
    """
    f = l2_normalize(features, axis=-1)
    sims = jnp.matmul(f, f.T, preferred_element_type=jnp.float32) / temperature
    B = features.shape[0]
    eye = jnp.eye(B, dtype=bool)
    pos = (labels[:, None] == labels[None, :]) & ~eye
    # log-softmax over non-self entries
    sims = jnp.where(eye, -jnp.inf, sims)
    logp = sims - jax.nn.logsumexp(sims, axis=1, keepdims=True)
    pos_count = jnp.maximum(pos.sum(axis=1), 1)
    per_anchor = jnp.where(pos, logp, 0.0).sum(axis=1) / pos_count
    has_pos = pos.any(axis=1)
    n_valid = jnp.maximum(has_pos.sum(), 1)
    return -jnp.where(has_pos, per_anchor, 0.0).sum() / n_valid


class AdaptiveHybridModel(nn.Module):
    """Three-descriptor hybrid model (reference: ...complete.py:207-293)."""

    backbone_name: str = "resnet50"
    outputdim: int = 2048
    num_classes: int = 81313  # used by the aux classifier head
    p: float = 3.0
    temperature: float = 0.07
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(
            name_=self.backbone_name,
            out_stages=(5,),
            dtype=self.dtype,
        )
        self.proj_sc = nn.Dense(self.outputdim, name="proj_sc_gem")
        self.proj_regional = nn.Dense(self.outputdim, name="proj_regional_gem")
        self.proj_scale = nn.Dense(self.outputdim, name="proj_scale_gem")
        self.classifier = nn.Dense(self.num_classes, name="classifier")

    @nn.compact_name_scope
    def descriptors(self, x, train: bool = False):
        """(sc_gem, regional_gem, scale_gem) — each [B, outputdim]."""
        fmap = self.backbone(x, train=train)
        B, H, W, C = fmap.shape

        # SC-GeM: global GeM gated by a learned token
        g = gem_pool(fmap, p=self.p)
        gate = nn.relu(nn.Dense(C // 2, name="token_learner_fc1")(g))
        gate = jax.nn.sigmoid(nn.Dense(C, name="token_learner_fc2")(gate))
        sc = self.proj_sc(g * gate)

        # Regional-GeM: 2x2 grid
        h2, w2 = max(H // 2, 1), max(W // 2, 1)
        regions = [
            gem_pool(fmap[:, :h2, :w2], p=self.p),
            gem_pool(fmap[:, :h2, w2:], p=self.p) if W > 1 else gem_pool(fmap[:, :h2, :w2], p=self.p),
            gem_pool(fmap[:, h2:, :w2], p=self.p) if H > 1 else gem_pool(fmap[:, :h2, :w2], p=self.p),
            gem_pool(fmap[:, h2:, w2:], p=self.p) if H > 1 and W > 1 else gem_pool(fmap[:, :h2, :w2], p=self.p),
        ]
        regional = self.proj_regional(jnp.concatenate(regions, axis=-1))

        # Scale-GeM: full + half scale
        half = jax.image.resize(
            fmap, (B, max(H // 2, 1), max(W // 2, 1), C), "bilinear"
        )
        scale = self.proj_scale(
            jnp.concatenate([gem_pool(fmap, p=self.p), gem_pool(half, p=self.p)],
                            axis=-1)
        )
        return sc, regional, scale

    def __call__(self, x, labels, train: bool = True):
        """Train forward: contrastive + CE over the SC-GeM descriptor."""
        sc, regional, scale = self.descriptors(x, train=train)
        fused = (sc + regional + scale) / 3.0
        logits = self.classifier(fused)
        loss = contrastive_loss(fused, labels, self.temperature)
        ce = jnp.mean(
            jax.nn.logsumexp(logits, axis=-1)
            - jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
        )
        return loss + ce, logits

    def extract(self, x, valid_hw=None):
        """Equal-weight fused descriptor (the query-side fusion rule,
        reference: ...complete.py:415-421)."""
        if valid_hw is not None:
            raise NotImplementedError(
                "masked-bucket extraction is not supported by this "
                "model; batch images of one resolution instead"
            )
        sc, regional, scale = self.descriptors(x, train=False)
        return l2_normalize((sc + regional + scale) / 3.0)


register_model(
    "adaptive_hybrid_r50",
    description="AdaptiveHybrid 3-descriptor model with QAFF serving (reference manus/7)",
    defaults=dict(backbone_name="resnet50"),
    family="adaptive_hybrid",
)(AdaptiveHybridModel)
