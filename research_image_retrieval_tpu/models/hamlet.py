"""HAMLET: hierarchical multi-scale features with cross-scale attention (P2).

Behavioral contract of the reference prototype
(reference: manus/2_HAMLET/hamlet_model.py:7-607): hierarchical feature
extraction from backbone stages, adaptive cross-scale attention (each
scale attends over the others after resize + projection), a
context-enhanced conv module, hierarchical fusion into a global
representation, optional multimodal (text) distillation head, and
HAMLETLoss = CE + lambda_d * distillation + lambda_h * hierarchy
consistency.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.models.backbone import ResNet, stage_extents
from research_image_retrieval_tpu.models.layers import Attention
from research_image_retrieval_tpu.models.registry import register_model
from research_image_retrieval_tpu.ops import (
    cross_entropy,
    gem_pool,
    hw_mask,
    l2_normalize,
)

__all__ = ["HAMLETModel", "hamlet_loss"]


class CrossScaleAttention(nn.Module):
    """Each scale's tokens cross-attend to the concatenated other scales
    (reference: hamlet_model.py:62-178)."""

    dim: int

    @nn.compact
    def __call__(self, scale_feats, deterministic: bool = True,
                 token_masks=None):
        # scale_feats: list of [B, Hi, Wi, dim] (already projected);
        # token_masks: optional list of [B, Hi*Wi] validity masks — padded
        # tokens are removed from every cross-attention key set
        tokens = [f.reshape(f.shape[0], -1, self.dim) for f in scale_feats]
        outs = []
        for i, t in enumerate(tokens):
            others = jnp.concatenate(
                [tok for j, tok in enumerate(tokens) if j != i], axis=1
            )
            key_mask = None
            if token_masks is not None:
                key_mask = jnp.concatenate(
                    [m for j, m in enumerate(token_masks) if j != i], axis=1
                )
            att = Attention(self.dim, num_heads=4, qkv_bias=True,
                            name=f"cross{i}")(
                nn.LayerNorm(epsilon=1e-5, name=f"ln{i}")(t), others, others,
                deterministic, key_mask=key_mask,
            )
            outs.append(t + att)
        return [
            o.reshape(f.shape) for o, f in zip(outs, scale_feats)
        ]


class ContextEnhancedConv(nn.Module):
    """Dilated context conv block (reference: hamlet_model.py:180-269)."""

    dim: int

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name=name,
        )
        remask = (
            (lambda y: y) if mask is None else (lambda y: y * mask[..., None])
        )
        # re-zero the pad region before each spatial conv so boundary
        # reads match the exact-shape run's zero padding
        y = nn.relu(bn("bn1")(nn.Conv(self.dim, (3, 3), padding=1,
                                      name="conv1")(remask(x))))
        y = nn.relu(
            bn("bn2")(
                nn.Conv(self.dim, (3, 3), padding=2, kernel_dilation=(2, 2),
                        name="conv2")(remask(y))
            )
        )
        return x + y


def hamlet_loss(logits, labels, scale_descs, text_features=None,
                student_text=None, distill_weight=0.5, hierarchy_weight=0.3):
    """CE + distillation + hierarchy consistency
    (reference: hamlet_model.py:548-607)."""
    loss = cross_entropy(logits, labels)
    aux = {"ce": loss}
    if text_features is not None and student_text is not None:
        t = l2_normalize(text_features, axis=-1)
        s = l2_normalize(student_text, axis=-1)
        distill = jnp.mean((s - t) ** 2)
        loss = loss + distill_weight * distill
        aux["distill"] = distill
    # hierarchy consistency: consecutive scale descriptors should agree
    cons = 0.0
    for a, b in zip(scale_descs[:-1], scale_descs[1:]):
        cons = cons + jnp.mean(
            (l2_normalize(a, axis=-1) - l2_normalize(b, axis=-1)) ** 2
        )
    loss = loss + hierarchy_weight * cons
    aux["hierarchy"] = cons
    return loss, aux


class HAMLETModel(nn.Module):
    """HAMLET with the dual train/extract API."""

    backbone_name: str = "resnet50"
    outputdim: int = 512
    num_classes: int = 81313
    hidden: int = 256
    distill_weight: float = 0.5
    hierarchy_weight: float = 0.3
    # teacher embedding width (DistilBERT hidden; data/teacher.py):
    # text_head projects the STUDENT into teacher space, so the frozen
    # teacher stays the fixed distillation target (no learned projection
    # of the teacher — that direction can collapse the MSE term)
    text_dim: int = 768
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(
            name_=self.backbone_name, out_stages=(3, 4, 5),
            dtype=self.dtype,
        )
        self.scale_projs = [
            nn.Dense(self.hidden, name=f"scale_proj{i}") for i in range(3)
        ]
        self.cross_scale = CrossScaleAttention(self.hidden)
        self.context = ContextEnhancedConv(self.hidden)
        self.fusion = nn.Dense(self.outputdim, name="fusion")
        self.text_head = nn.Dense(self.text_dim, name="text_head")
        self.classifier = nn.Dense(self.num_classes, name="classifier")

    def _multi_scale(self, x, train: bool, valid_hw=None):
        taps = self.backbone(x, train=train, valid_hw=valid_hw)
        feats = [
            self.scale_projs[i](taps[s]) for i, s in enumerate((3, 4, 5))
        ]
        masks = tmasks = None
        if valid_hw is not None:
            exts = [stage_extents(valid_hw, s) for s in (3, 4, 5)]
            masks = [
                hw_mask(f.shape[1], f.shape[2], e)
                for f, e in zip(feats, exts)
            ]
            tmasks = [m.reshape(m.shape[0], -1) for m in masks]
        feats = self.cross_scale(feats, deterministic=not train,
                                 token_masks=tmasks)
        feats = [
            self.context(f, train=train,
                         mask=None if masks is None else masks[i])
            for i, f in enumerate(feats)
        ]
        descs = [
            gem_pool(f, p=3.0,
                     valid_hw=None if masks is None else masks[i])
            for i, f in enumerate(feats)
        ]  # [B, hidden] each
        fused = self.fusion(jnp.concatenate(descs, axis=-1))
        return fused, descs

    def __call__(self, x, labels, train: bool = True, text_features=None):
        """``text_features``: optional precomputed teacher embeddings,
        [B, text_dim] or [B, L, text_dim] (token sequences mean-pool) —
        the offline-teacher pattern (data/teacher.py; the reference runs
        its text encoder in-forward, hamlet_model.py:473-607)."""
        fused, descs = self._multi_scale(x, train)
        logits = self.classifier(fused)
        if text_features is None:
            # materialize text_head so the param tree is identical with
            # and without a teacher — init without one, resume with one
            _ = self.text_head(jnp.zeros_like(fused[:1]))
            student_text = None
        else:
            if text_features.ndim == 3:
                text_features = jnp.mean(text_features, axis=1)
            text_features = jax.lax.stop_gradient(text_features)
            student_text = self.text_head(fused)
        loss, _ = hamlet_loss(
            logits, labels, descs, text_features, student_text,
            self.distill_weight, self.hierarchy_weight,
        )
        return loss, logits

    def extract(self, x, valid_hw=None):
        """L2-normalized descriptor; ``valid_hw`` = [B, 2] input-pixel
        extents for bucketed variable-resolution extraction."""
        fused, _ = self._multi_scale(x, train=False, valid_hw=valid_hw)
        return l2_normalize(fused)


register_model(
    "hamlet_r50",
    description="HAMLET hierarchical multi-scale + cross-scale attention prototype (reference manus/2_HAMLET/hamlet_model.py)",
    defaults=dict(backbone_name="resnet50", outputdim=512),
    family="hamlet",
)(HAMLETModel)
