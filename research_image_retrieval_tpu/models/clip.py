"""CLIP: dual-tower vision/text model (vendored-backbone capability).

Behavioral contract of the reference's vendored CLIP
(reference: networks/model.py:10-442): a VisionTransformer visual tower
(with quick-GELU and pre-LN — provided by models.vit), a causal text
transformer over BPE token ids, learned logit scale, and the contrastive
image-text objective.  The reference uses CLIP as an alternative
backbone / pretrained source for retrieval; ``image_features`` here is the
retrieval-facing surface.

Weight conversion from OpenAI CLIP state dicts can reuse the layout
conventions of models.backbone.convert_torch_resnet (OIHW->HWIO convs,
transposed linears).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from research_image_retrieval_tpu.models.clip_resnet import (
    CLIP_RESNET_CONFIGS,
    ModifiedResNet,
)
from research_image_retrieval_tpu.models.registry import register_model
from research_image_retrieval_tpu.models.vit import VIT_CONFIGS, VisionTransformer
from research_image_retrieval_tpu.ops import l2_normalize

__all__ = [
    "CLIP",
    "CLIPTextEncoder",
    "CLIPGlobalModel",
    "clip_contrastive_loss",
]


class CLIPTextBlock(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm(epsilon=1e-5, name="ln1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, deterministic=True, name="attn"
        )(h, h, mask=mask)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="ln2")(x)
        h = nn.Dense(4 * self.dim, name="mlp_fc1")(h)
        h = h * jax.nn.sigmoid(1.702 * h)  # quick-GELU
        h = nn.Dense(self.dim, name="mlp_fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    """Causal text transformer (reference: networks/model.py:245-330)."""

    vocab_size: int = 49408
    context_length: int = 77
    dim: int = 512
    depth: int = 12
    heads: int = 8
    embed_dim: int = 512

    @nn.compact
    def __call__(self, token_ids):
        """token_ids: [B, T] int32 (0-padded after the EOT token)."""
        B, T = token_ids.shape
        x = nn.Embed(self.vocab_size, self.dim, name="token_embedding")(token_ids)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.dim),
        )
        x = x + pos[:T]
        causal = nn.make_causal_mask(token_ids)
        for i in range(self.depth):
            x = CLIPTextBlock(self.dim, self.heads, name=f"block{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        # feature at the EOT token = highest token id position (CLIP rule)
        eot = jnp.argmax(token_ids, axis=1)
        feat = x[jnp.arange(B), eot]
        return nn.Dense(self.embed_dim, use_bias=False, name="text_projection")(feat)


def clip_contrastive_loss(image_features, text_features, logit_scale):
    """Symmetric InfoNCE over an aligned image/text batch."""
    im = l2_normalize(image_features, axis=-1)
    tx = l2_normalize(text_features, axis=-1)
    logits = logit_scale * jnp.matmul(
        im, tx.T, preferred_element_type=jnp.float32
    )
    labels = jnp.arange(logits.shape[0])
    logz_i = jax.nn.logsumexp(logits, axis=1)
    logz_t = jax.nn.logsumexp(logits, axis=0)
    diag = jnp.diagonal(logits)
    return 0.5 * (jnp.mean(logz_i - diag) + jnp.mean(logz_t - diag))


class CLIP(nn.Module):
    """Dual-tower CLIP; ``image_features`` doubles as a retrieval descriptor.

    ``visual_variant`` selects the tower: a ``VIT_CONFIGS`` key ("b32",
    "b16", "l14", ...) builds the quick-GELU VisionTransformer
    (reference: networks/model.py:206-243); a ``CLIP_RESNET_CONFIGS`` key
    ("r50", "r101") builds the attention-pooled ModifiedResNet
    (reference: networks/model.py:94-154).
    """

    visual_variant: str = "b32"
    embed_dim: int = 512
    vocab_size: int = 49408
    context_length: int = 77
    text_dim: int = 512
    text_depth: int = 12
    text_heads: int = 8
    img_size: int = 224

    def setup(self):
        if self.visual_variant in CLIP_RESNET_CONFIGS:
            cfg = CLIP_RESNET_CONFIGS[self.visual_variant]
            self.visual = ModifiedResNet(
                output_dim=self.embed_dim,
                input_resolution=self.img_size,
                **cfg,
            )
            self.visual_proj = None  # the attnpool c_proj already projects
        else:
            cfg = VIT_CONFIGS[self.visual_variant]
            self.visual = VisionTransformer(
                img_size=self.img_size, quick_gelu=True, **cfg
            )
            self.visual_proj = nn.Dense(
                self.embed_dim, use_bias=False, name="visual_projection"
            )
        self.text = CLIPTextEncoder(
            vocab_size=self.vocab_size, context_length=self.context_length,
            dim=self.text_dim, depth=self.text_depth, heads=self.text_heads,
            embed_dim=self.embed_dim,
        )
        self.logit_scale = self.param(
            "logit_scale", lambda _: jnp.asarray(np.log(1 / 0.07), jnp.float32)
        )

    def image_features(self, images, valid_hw=None):
        if self.visual_proj is None:
            return self.visual(images, train=False, valid_hw=valid_hw)
        cls, _ = self.visual(images, train=False, valid_hw=valid_hw)
        return self.visual_proj(cls)

    def text_features(self, token_ids):
        return self.text(token_ids)

    def __call__(self, images, token_ids):
        im = self.image_features(images)
        tx = self.text_features(token_ids)
        scale = jnp.exp(self.logit_scale)
        loss = clip_contrastive_loss(im, tx, scale)
        return loss, (im, tx)

    def extract(self, images, valid_hw=None):
        """Retrieval-facing descriptor (L2-normalized image embedding).

        ``valid_hw``: [B, 2] TRUE extents for masked bucketed
        extraction — patch-multiples for ViT towers (see
        VisionTransformer contract), any extent for the ModifiedResNet
        tower (per-image pos-embed interpolation + masked attnpool,
        clip_resnet.AttentionPool2d)."""
        return l2_normalize(self.image_features(images, valid_hw=valid_hw))


class CLIPGlobalModel(nn.Module):
    """CLIP visual tower + ArcFace head as a registry retrieval model.

    The param tree of the tower matches ``CLIP`` ("visual" /
    "visual_projection"), so ``clip_convert.load_clip_visual_into`` drops a
    real OpenAI-layout checkpoint's visual weights straight in — the CLIP
    counterpart of ``backbone.convert_torch_resnet`` (reference pretrained
    source: networks/model.py:292-345).
    """

    variant: str = "b32"  # VIT_CONFIGS key or CLIP_RESNET_CONFIGS key
    outputdim: int = 512  # CLIP embed dim (tower output) = descriptor dim
    num_classes: int = 81313
    s: float = 32.0
    m: float = 0.15
    img_size: int = 224
    dtype: Any = jnp.float32  # tower compute dtype (params stay fp32;
    # projection, L2 norm, and the ArcFace head always run fp32)

    @property
    def extent_multiple(self) -> int:
        """Grid alignment for bucketed masked extraction: patch size for
        ViT towers; 1 for the ModifiedResNet tower (its masked path
        tracks ceil/floor-halving extents like the plain ResNet and
        interpolates the attnpool pos embedding per image)."""
        if self.variant in CLIP_RESNET_CONFIGS:
            return 1
        return VIT_CONFIGS[self.variant]["patch"]

    def setup(self):
        if self.variant in CLIP_RESNET_CONFIGS:
            self.visual = ModifiedResNet(
                output_dim=self.outputdim,
                input_resolution=self.img_size,
                dtype=self.dtype,
                **CLIP_RESNET_CONFIGS[self.variant],
            )
            self.visual_proj = None
        else:
            self.visual = VisionTransformer(
                img_size=self.img_size, quick_gelu=True, dtype=self.dtype,
                **VIT_CONFIGS[self.variant],
            )
            self.visual_proj = nn.Dense(
                self.outputdim, use_bias=False, name="visual_projection"
            )
        self.classifier_w = self.param(
            "classifier_w",
            nn.initializers.xavier_uniform(),
            (self.num_classes, self.outputdim),
        )

    def _descriptor(self, x, train: bool, valid_hw=None):
        if self.visual_proj is None:
            return self.visual(
                x, train=train, valid_hw=valid_hw
            ).astype(jnp.float32)
        cls, _ = self.visual(x, train=train, valid_hw=valid_hw)
        return self.visual_proj(cls.astype(jnp.float32))

    def __call__(self, x, labels, train: bool = True):
        from research_image_retrieval_tpu.ops import arcface_logits, cross_entropy

        feat = self._descriptor(x, train)
        # margin only at train; eval logits are plain scaled cosine
        logits = arcface_logits(
            feat, self.classifier_w, labels, s=self.s,
            m=self.m if train else 0.0,
        )
        return cross_entropy(logits, labels), logits

    def extract(self, x, valid_hw=None):
        """L2-normalized descriptor.  ``valid_hw`` (ViT towers only):
        [B, 2] TRUE extents, multiples of the patch size (see
        VisionTransformer contract); the ModifiedResNet tower is
        exact-shape by design."""
        return l2_normalize(
            self._descriptor(x, train=False, valid_hw=valid_hw)
        )


register_model(
    "clip_vit_b32",
    description="CLIP ViT-B/32 visual tower + ArcFace; loads OpenAI-layout checkpoints via clip_convert (reference networks/model.py:206-243)",
    defaults=dict(variant="b32", outputdim=512),
    family="clip_vit",
)(CLIPGlobalModel)

register_model(
    "clip_r50",
    description="CLIP ModifiedResNet-50 (attention-pooled) + ArcFace; loads OpenAI-layout checkpoints via clip_convert (reference networks/model.py:94-154)",
    defaults=dict(variant="r50", outputdim=1024),
    family="clip_rn",
)(CLIPGlobalModel)
