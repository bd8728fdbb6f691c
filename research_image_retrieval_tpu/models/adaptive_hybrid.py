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

from research_image_retrieval_tpu.models.backbone import ResNet, stage_extents
from research_image_retrieval_tpu.models.registry import register_model
from research_image_retrieval_tpu.ops import (
    dense_resize_weights,
    gem_pool,
    hw_mask,
    l2_normalize,
)

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
    def descriptors(self, x, train: bool = False, valid_hw=None):
        """(sc_gem, regional_gem, scale_gem) — each [B, outputdim].

        With ``valid_hw`` ([B, 2] pixel extents, masked bucketed
        extraction) every branch pools only each image's valid stage-5
        region: the 2x2 regional grid splits at the PER-IMAGE half
        extents and the Scale-GeM half resize runs through per-image
        ``dense_resize_weights`` (the same triangle kernel as
        ``jax.image.resize``), so padded output equals the exact-shape
        run (tests/test_masked_extract.py)."""
        fmap = self.backbone(x, train=train, valid_hw=valid_hw)
        B, H, W, C = fmap.shape

        if valid_hw is None:
            vh = jnp.full((B,), H, jnp.int32)
            vw = jnp.full((B,), W, jnp.int32)
            mask = None
        else:
            ext = stage_extents(valid_hw, 5)
            vh, vw = ext[:, 0], ext[:, 1]
            mask = hw_mask(H, W, ext)

        # SC-GeM: global GeM gated by a learned token
        g = gem_pool(fmap, p=self.p, valid_hw=mask)
        gate = nn.relu(nn.Dense(C // 2, name="token_learner_fc1")(g))
        gate = jax.nn.sigmoid(nn.Dense(C, name="token_learner_fc2")(gate))
        sc = self.proj_sc(g * gate)

        # Regional-GeM: 2x2 grid over each image's valid extent
        # (reference slices fmap[:, :H//2, :W//2] etc., degenerate rows/
        # cols falling back to the top-left region — replicated per image
        # via quadrant masks)
        h2 = jnp.maximum(vh // 2, 1)[:, None, None]            # [B,1,1]
        w2 = jnp.maximum(vw // 2, 1)[:, None, None]
        rows = jnp.arange(H)[None, :, None]
        cols = jnp.arange(W)[None, None, :]
        in_h = rows < vh[:, None, None]
        in_w = cols < vw[:, None, None]
        m_tl = (rows < h2) & (cols < w2)
        m_tr = (rows < h2) & (cols >= w2) & in_w
        m_bl = (rows >= h2) & in_h & (cols < w2)
        m_br = (rows >= h2) & in_h & (cols >= w2) & in_w
        # degenerate extents (vw<=1 / vh<=1): the reference's static
        # guards reuse the top-left region
        use_tl_w = (vw[:, None, None] <= 1)
        use_tl_h = (vh[:, None, None] <= 1)
        m_tr = jnp.where(use_tl_w, m_tl, m_tr)
        m_bl = jnp.where(use_tl_h, m_tl, m_bl)
        m_br = jnp.where(use_tl_h | use_tl_w, m_tl, m_br)
        regions = [gem_pool(fmap, p=self.p, valid_hw=m)
                   for m in (m_tl, m_tr, m_bl, m_br)]
        regional = self.proj_regional(jnp.concatenate(regions, axis=-1))

        # Scale-GeM: full + half scale
        Hh, Wh = max(H // 2, 1), max(W // 2, 1)
        if valid_hw is None:
            half = jax.image.resize(fmap, (B, Hh, Wh, C), "bilinear")
            half_mask = None
        else:
            oh = jnp.maximum(vh // 2, 1)
            ow = jnp.maximum(vw // 2, 1)
            wr = dense_resize_weights(vh, oh, H, Hh)           # [B, Hh, H]
            half = jnp.einsum("boh,bhwc->bowc", wr,
                              fmap.astype(jnp.float32))
            wc = dense_resize_weights(vw, ow, W, Wh)           # [B, Wh, W]
            half = jnp.einsum("bow,bhwc->bhoc", wc, half)
            half_mask = hw_mask(Hh, Wh, jnp.stack([oh, ow], axis=1))
        scale = self.proj_scale(
            jnp.concatenate(
                [gem_pool(fmap, p=self.p, valid_hw=mask),
                 gem_pool(half, p=self.p, valid_hw=half_mask)],
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
        reference: ...complete.py:415-421).  Supports masked bucketed
        extraction (``valid_hw`` [B, 2] pixel extents)."""
        sc, regional, scale = self.descriptors(x, train=False,
                                               valid_hw=valid_hw)
        return l2_normalize((sc + regional + scale) / 3.0)


register_model(
    "adaptive_hybrid_r50",
    description="AdaptiveHybrid 3-descriptor model with QAFF serving (reference manus/7)",
    defaults=dict(backbone_name="resnet50"),
    family="adaptive_hybrid",
)(AdaptiveHybridModel)
