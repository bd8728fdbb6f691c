"""SPARSE: adaptive sparse encoding + semantic-preserving quantization (P1).

Behavioral contract of the reference prototype
(reference: manus/1_SPARSE/sparse_model.py:150-331):

* AdaptiveSparseEncoder — an MLP predicts a per-sample sparsity in
  [min, max]; features below the per-sample |value| quantile threshold
  are zeroed (the reference's per-sample kthvalue loop becomes a sort +
  per-sample gather); an L1 regularizer encourages sparsity.
* SemanticPreservingQuantization — an importance MLP allocates 2..8 bits
  per dimension; affine quantize/dequantize with a straight-through
  estimator; reconstruction + importance-weighted semantic losses.
* LLMKnowledgeDistillation — projection MLPs + a distillation head and an
  InfoNCE-style contrastive loss against TEACHER text embeddings
  (reference: sparse_model.py:1-149).  The reference embeds a DistilBERT
  teacher inside the model; here the teacher runs OFFLINE on the host and
  the train step takes precomputed ``text_features`` (the same pattern as
  ``hamlet_loss`` — keeps the jitted TPU program static and free of a
  host-bound tokenizer).
* the IQE companion lives in index.qe.IterativeQueryExpansion.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.models.backbone import ResNet, stage_extents
from research_image_retrieval_tpu.models.registry import register_model
from research_image_retrieval_tpu.ops import (
    cross_entropy,
    gem_pool,
    hw_mask,
    l2_normalize,
)

__all__ = ["SparseRetrievalModel", "AdaptiveSparseEncoder",
           "SemanticPreservingQuantization", "LLMKnowledgeDistillation"]


class _ProjMLP(nn.Module):
    """Dense -> LayerNorm -> GELU -> Dense (the reference's projection
    block shape, sparse_model.py:33-68)."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.out_dim * 2, name="fc1")(x)
        h = nn.gelu(nn.LayerNorm(epsilon=1e-5, name="ln")(h))
        return nn.Dense(self.out_dim, name="fc2")(h)


class LLMKnowledgeDistillation(nn.Module):
    """Contrastive distillation from precomputed teacher text embeddings
    (reference: sparse_model.py:9-149).

    ``text_features`` may be [B, text_dim] (pooled) or [B, L, text_dim]
    (token sequence; mean-pooled here, matching the reference).  The
    distillation loss is InfoNCE: cosine similarities between the
    distillation head's output and the projected teacher embeddings,
    temperature-scaled, cross-entropy against the diagonal.

    All three MLPs materialize their params on every call (a zero-batch
    drive of text_proj when no teacher batch is present) so the param
    tree is identical whether or not a teacher is used — init without a
    teacher, resume with one.
    """

    embed_dim: int = 256
    text_dim: int = 768  # DistilBERT hidden size (reference default)
    temperature: float = 2.0

    @nn.compact
    def __call__(self, visual_features, text_features=None):
        if visual_features.ndim == 4:  # [B, H, W, C] featuremap -> GAP
            visual_features = jnp.mean(visual_features, axis=(1, 2))
        visual_embed = _ProjMLP(self.embed_dim, name="visual_proj")(
            visual_features
        )
        distill_embed = _ProjMLP(self.embed_dim, name="distill_head")(
            visual_embed
        )
        text_proj = _ProjMLP(self.embed_dim, name="text_proj")
        out = {
            "visual_embed": visual_embed,
            "distill_embed": distill_embed,
            "distill_loss": jnp.float32(0.0),
        }
        if text_features is None:
            text_proj(jnp.zeros((1, self.text_dim)))  # materialize params
            return out
        if text_features.ndim == 3:  # [B, L, D] -> mean over tokens
            text_features = jnp.mean(text_features, axis=1)
        text_embed = text_proj(jax.lax.stop_gradient(text_features))
        t = l2_normalize(text_embed, axis=-1)
        d = l2_normalize(distill_embed, axis=-1)
        sim = (d @ t.T) / self.temperature
        labels = jnp.arange(sim.shape[0])
        out.update(
            text_embed=text_embed,
            distill_loss=cross_entropy(sim, labels),
        )
        return out


class AdaptiveSparseEncoder(nn.Module):
    """Learned per-sample sparsification (reference: sparse_model.py:150-230)."""

    input_dim: int
    min_sparsity: float = 0.05
    max_sparsity: float = 0.3

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.input_dim // 4, name="sp_fc1")(x))
        s = jax.nn.sigmoid(nn.Dense(1, name="sp_fc2")(h))  # [B, 1]
        sparsity = self.min_sparsity + (self.max_sparsity - self.min_sparsity) * s

        D = x.shape[1]
        abs_x = jnp.abs(x)
        sorted_abs = jnp.sort(abs_x, axis=1)  # ascending
        # kth smallest with k = round(D * (1 - sparsity)), 1-based
        k = jnp.clip(
            jnp.round(D * (1.0 - sparsity[:, 0])).astype(jnp.int32), 1, D
        )
        threshold = jnp.take_along_axis(sorted_abs, (k - 1)[:, None], axis=1)
        mask = (abs_x > threshold).astype(x.dtype)
        sparse_x = x * mask
        return {
            "sparse_features": sparse_x,
            "mask": mask,
            "sparsity": sparsity,
            "actual_sparsity": mask.sum(axis=1) / D,
            "l1_reg": jnp.abs(sparse_x).sum(axis=1).mean(),
        }


class SemanticPreservingQuantization(nn.Module):
    """Mixed 2-8 bit STE quantization (reference: sparse_model.py:235-331)."""

    input_dim: int
    min_bits: int = 2
    max_bits: int = 8
    semantic_weight: float = 0.5

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.input_dim // 2, name="imp_fc1")(x))
        importance = jax.nn.sigmoid(
            nn.Dense(self.input_dim, name="imp_fc2")(h)
        )  # [B, D]
        bits = jnp.round(
            self.min_bits + (self.max_bits - self.min_bits) * importance
        )

        scale = jnp.abs(self.param("scale", nn.initializers.ones, (1,))) + 1e-6
        zero_point = self.param("zero_point", nn.initializers.zeros, (1,))

        qmax = 2.0**bits - 1.0
        x_scaled = x / scale + zero_point
        x_rounded = jnp.round(jnp.clip(x_scaled, 0.0, qmax))
        x_deq = (x_rounded - zero_point) * scale

        # straight-through estimator
        x_ste = x + jax.lax.stop_gradient(x_deq - x)

        recon = jnp.mean((x_deq - x) ** 2)
        semantic = jnp.sum(importance * jnp.abs(x_deq - x), axis=1).mean()
        return {
            "quantized_features": x_ste,
            "importance": importance,
            "bits": bits,
            "avg_bits": bits.mean(),
            "recon_loss": recon,
            "semantic_loss": semantic,
            "quant_loss": recon + self.semantic_weight * semantic,
        }


class SparseRetrievalModel(nn.Module):
    """Backbone + GeM + sparse encoding + quantization, CE training.

    descriptor = L2(quantized sparse features) — compact and
    mixed-precision by construction.
    """

    backbone_name: str = "resnet50"
    outputdim: int = 512
    num_classes: int = 81313
    l1_weight: float = 1e-4
    quant_weight: float = 0.1
    distill_weight: float = 0.5
    distill_dim: int = 256
    text_dim: int = 768  # teacher embedding width (DistilBERT hidden)
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(
            name_=self.backbone_name, out_stages=(5,),
            dtype=self.dtype,
        )
        self.proj = nn.Dense(self.outputdim, name="proj")
        self.sparse = AdaptiveSparseEncoder(self.outputdim)
        self.quant = SemanticPreservingQuantization(self.outputdim)
        self.distill = LLMKnowledgeDistillation(
            embed_dim=self.distill_dim, text_dim=self.text_dim,
            name="distill",
        )
        self.classifier = nn.Dense(self.num_classes, name="classifier")

    def _encode(self, x, train: bool, valid_hw=None):
        fmap = self.backbone(x, train=train, valid_hw=valid_hw)
        mask = None
        if valid_hw is not None:
            ext = stage_extents(valid_hw, 5)
            mask = hw_mask(fmap.shape[1], fmap.shape[2], ext)
        feat = self.proj(gem_pool(fmap, p=3.0, valid_hw=mask))
        sp = self.sparse(feat)
        q = self.quant(sp["sparse_features"])
        return q["quantized_features"], sp, q

    def __call__(self, x, labels, train: bool = True, text_features=None):
        """``text_features``: optional precomputed teacher embeddings
        ([B, D_text] or [B, L, D_text]) — adds the LKD contrastive
        distillation term (reference: sparse_model.py:96-149)."""
        feat, sp, q = self._encode(x, train)
        logits = self.classifier(feat)
        loss = (
            cross_entropy(logits, labels)
            + self.l1_weight * sp["l1_reg"]
            + self.quant_weight * q["quant_loss"]
        )
        lkd = self.distill(feat, text_features)
        if text_features is not None:
            loss = loss + self.distill_weight * lkd["distill_loss"]
        return loss, logits

    def extract(self, x, valid_hw=None):
        """L2-normalized descriptor; ``valid_hw`` = [B, 2] input-pixel
        extents for bucketed variable-resolution extraction."""
        feat, _, _ = self._encode(x, train=False, valid_hw=valid_hw)
        return l2_normalize(feat)


register_model(
    "sparse_r50",
    description="SPARSE adaptive sparse + mixed-bit quantized descriptors (reference manus/1_SPARSE/sparse_model.py)",
    defaults=dict(backbone_name="resnet50", outputdim=512),
    family="sparse",
)(SparseRetrievalModel)
