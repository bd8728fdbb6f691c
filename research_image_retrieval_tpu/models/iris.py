"""IRIS: ORACLE -> CASTLE -> NEXUS retrieval model (research prototype P4).

Behavioral contract of the reference corrected implementation
(reference: manus/8_6and7_training_and_eval/iris_modified/
iris_implementation_corrected.py:75-359):

* ORACLE — object-relation pooling: 3x3 conv reduce, adaptive pooling to
  ``num_objects`` object slots, MHA relation modeling, blended with the
  projected global context (context_balance).
* CASTLE — causal attention over the (single-token) feature: MHA, a
  sigmoid causal gate thresholded at 0.5, refinement MLP blended with
  counterfactual_strength.
* NEXUS — local/global MLP branches over the attended feature, fused.
* IRISLoss — CE + contrastive retrieval loss (temperature-scaled batch
  similarity with positive/negative label masks).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.models.backbone import ResNet, stage_extents
from research_image_retrieval_tpu.models.registry import register_model
from research_image_retrieval_tpu.ops import (
    avg_pool_all,
    cross_entropy,
    hw_mask,
    l2_normalize,
)

__all__ = ["IRISModel", "iris_loss"]


class ORACLE(nn.Module):
    """Object-relation pooling (reference: iris...corrected.py:75-129)."""

    output_dim: int = 512
    num_objects: int = 8
    context_balance: float = 0.5
    num_heads: int = 4

    @nn.compact
    def __call__(self, fmap, deterministic: bool = True, extents=None):
        B, H, W, C = fmap.shape
        if extents is not None:
            # re-zero pad pixels so the 3x3 reads exact zero padding
            fmap = fmap * hw_mask(H, W, extents, dtype=fmap.dtype)[..., None]
        conv = nn.relu(nn.Conv(512, (3, 3), padding=1, name="conv_reduce")(fmap))
        # AdaptiveAvgPool2d((num_objects, 1)) semantics: bins over the H
        # axis (each averaging the full W), bin i = rows
        # [floor(i*H/O), ceil((i+1)*H/O)) — bins always overlap real rows,
        # so no object slot is ever empty (unlike contiguous zero-padded
        # chunking, which left dead slots when H*W < num_objects * chunk)
        if extents is None:
            rows = conv.mean(axis=2)  # [B, H, 512]
            bins = []
            for i in range(self.num_objects):
                lo = (i * H) // self.num_objects
                hi = -(-(i + 1) * H // self.num_objects)
                hi = max(hi, lo + 1)
                bins.append(rows[:, lo:hi].mean(axis=1))
            obj = jnp.stack(bins, axis=1)  # [B, O, 512]
        else:
            # masked row means over the true width, then dynamic bins
            # over the TRUE height (bin boundaries vary per image)
            h_t = extents[:, 0:1]  # [B, 1]
            w_t = extents[:, 1:2].astype(conv.dtype)  # [B, 1]
            cmask = (
                jnp.arange(W)[None, :] < extents[:, 1][:, None]
            ).astype(conv.dtype)  # [B, W]
            rows = jnp.einsum(
                "bhwc,bw->bhc", conv, cmask,
                preferred_element_type=jnp.float32,
            ) / jnp.maximum(w_t, 1.0)[:, :, None]  # [B, H, 512]
            ridx = jnp.arange(H)[None, :]  # [1, H]
            bins = []
            for i in range(self.num_objects):
                lo = (i * h_t) // self.num_objects  # [B, 1]
                hi = -(-(i + 1) * h_t // self.num_objects)
                hi = jnp.maximum(hi, lo + 1)
                rmask = ((ridx >= lo) & (ridx < hi)).astype(conv.dtype)
                cnt = jnp.maximum(jnp.sum(rmask, 1, keepdims=True), 1.0)
                bins.append(
                    jnp.einsum("bhc,bh->bc", rows, rmask,
                               preferred_element_type=jnp.float32)
                    / cnt
                )
            obj = jnp.stack(bins, axis=1)  # [B, O, 512]
        obj = nn.Dense(self.output_dim, name="obj_proj")(obj)  # [B, O, D]

        attended = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, deterministic=deterministic,
            name="relation_net",
        )(obj, obj)
        aggregated = attended.mean(axis=1)  # [B, D]

        gmask = None if extents is None else hw_mask(H, W, extents)
        global_ctx = nn.Dense(self.output_dim, name="context_proj")(
            avg_pool_all(fmap, valid_hw=gmask)
        )
        fused = (
            self.context_balance * aggregated
            + (1.0 - self.context_balance) * global_ctx
        )
        return nn.Dense(self.output_dim, name="final_proj")(fused)


class CASTLE(nn.Module):
    """Causal-gated attention refinement (reference: :131-181)."""

    dim: int = 512
    num_heads: int = 8
    causal_threshold: float = 0.5
    counterfactual_strength: float = 0.3

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        t = x[:, None, :]  # [B, 1, D]
        attended = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, deterministic=deterministic,
            name="attention",
        )(t, t)
        h = nn.relu(nn.Dense(self.dim // 2, name="causal_fc1")(attended))
        causal = jax.nn.sigmoid(nn.Dense(1, name="causal_fc2")(h))
        mask = (causal > self.causal_threshold).astype(attended.dtype)
        masked = attended * mask
        refined = nn.Dense(self.dim, name="refine_fc2")(
            nn.relu(nn.Dense(self.dim, name="refine_fc1")(masked))
        )
        return (attended + self.counterfactual_strength * refined)[:, 0]


class NEXUS(nn.Module):
    """Local/global branch fusion (reference: :183-233)."""

    dim: int = 512
    num_heads: int = 8

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        t = x[:, None, :]
        attended = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, deterministic=deterministic,
            name="attention",
        )(t, t)
        local = nn.Dense(self.dim, name="local_fc2")(
            nn.relu(nn.Dense(self.dim // 2, name="local_fc1")(attended))
        )
        glob = nn.Dense(self.dim, name="global_fc2")(
            nn.relu(nn.Dense(self.dim // 2, name="global_fc1")(attended))
        )
        fused = nn.Dense(self.dim, name="fusion_fc2")(
            nn.relu(
                nn.Dense(self.dim, name="fusion_fc1")(
                    jnp.concatenate([local, glob], axis=-1)
                )
            )
        )
        return fused[:, 0]


def iris_loss(logits, features, labels, temperature=0.07,
              classification_weight=1.0, retrieval_weight=0.5):
    """CE + contrastive retrieval loss (reference: :317-359)."""
    cls_loss = cross_entropy(logits, labels)
    f = l2_normalize(features, axis=-1)
    sim = jnp.matmul(f, f.T, preferred_element_type=jnp.float32) / temperature
    B = features.shape[0]
    eye = jnp.eye(B, dtype=bool)
    pos = (labels[:, None] == labels[None, :]) & ~eye
    neg = ~(labels[:, None] == labels[None, :])
    pos_loss = -jnp.log(
        jnp.sum(jnp.exp(sim * pos), axis=1) + 1e-8
    ).mean()
    neg_loss = jnp.log(jnp.sum(jnp.exp(sim * neg), axis=1) + 1e-8).mean()
    return classification_weight * cls_loss + retrieval_weight * (
        pos_loss + neg_loss
    )


class IRISModel(nn.Module):
    """Full IRIS (reference: :235-297) with the dual train/extract API."""

    backbone_name: str = "resnet50"
    outputdim: int = 512
    num_classes: int = 81313
    dropout: float = 0.1
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(
            name_=self.backbone_name, out_stages=(5,),
            dtype=self.dtype,
        )
        self.oracle = ORACLE(output_dim=self.outputdim)
        self.castle = CASTLE(dim=self.outputdim)
        self.nexus = NEXUS(dim=self.outputdim)
        self.feature_proj = nn.Dense(self.outputdim, name="feature_proj")
        self.drop = nn.Dropout(self.dropout)
        self.classifier = nn.Dense(self.num_classes, name="classifier")

    def _features(self, x, train: bool, valid_hw=None):
        fmap = self.backbone(x, train=train, valid_hw=valid_hw)
        ext = None
        if valid_hw is not None:
            ext = stage_extents(valid_hw, 5)
        f = self.oracle(fmap, deterministic=not train, extents=ext)
        f = self.castle(f, deterministic=not train)
        f = self.nexus(f, deterministic=not train)
        f = self.feature_proj(f)
        return self.drop(f, deterministic=not train)

    def __call__(self, x, labels, train: bool = True):
        feat = self._features(x, train)
        logits = self.classifier(feat)
        return iris_loss(logits, feat, labels), logits

    def extract(self, x, valid_hw=None):
        """L2-normalized descriptor; ``valid_hw`` = [B, 2] input-pixel
        extents for bucketed variable-resolution extraction."""
        return l2_normalize(self._features(x, train=False,
                                           valid_hw=valid_hw))


register_model(
    "iris_r50",
    description="IRIS ORACLE+CASTLE+NEXUS prototype (reference manus/8 iris_implementation_corrected.py)",
    defaults=dict(backbone_name="resnet50", outputdim=512),
    family="iris",
)(IRISModel)
