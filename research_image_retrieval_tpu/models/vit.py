"""Vision Transformer backbone + ViT global-descriptor retrieval model.

Covers the reference's transformer-backbone capability (the vendored CLIP
VisionTransformer, reference: networks/model.py:206-243, including its
optional prompt tokens) and BASELINE config #3 (ViT/DINOv2 global
descriptor with CLS + GeM-token pooling).

TPU notes: pre-norm blocks, fp32 attention accumulation, position
embeddings bilinearly resized at trace time for non-native resolutions
(static shapes per bucket), bf16-friendly throughout.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.models.registry import register_model
from research_image_retrieval_tpu.ops import (
    arcface_logits,
    cross_entropy,
    l2_normalize,
)

__all__ = ["VisionTransformer", "ViTGlobalModel", "VIT_CONFIGS"]

VIT_CONFIGS = {
    "ti16": dict(dim=192, depth=12, heads=3, patch=16),
    "s16": dict(dim=384, depth=12, heads=6, patch=16),
    "b16": dict(dim=768, depth=12, heads=12, patch=16),
    "b32": dict(dim=768, depth=12, heads=12, patch=32),
    "l14": dict(dim=1024, depth=24, heads=16, patch=14),
    # tiny config for tests
    "test": dict(dim=32, depth=2, heads=2, patch=8),
}


class ViTBlock(nn.Module):
    """Pre-norm transformer block (LN -> MHA -> LN -> MLP, residual)."""

    dim: int
    heads: int
    mlp_ratio: float = 4.0
    quick_gelu: bool = False  # CLIP uses x*sigmoid(1.702x)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, token_mask=None):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(x)
        attn_mask = None
        if token_mask is not None:
            # [B, N] validity -> [B, 1, 1, N]: padded tokens are removed
            # from every query's key set
            attn_mask = token_mask[:, None, None, :].astype(bool)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim,
            deterministic=deterministic, dtype=self.dtype,
            force_fp32_for_softmax=True, name="attn",
        )(h, h, mask=attn_mask)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(h)
        if self.quick_gelu:
            h = h * jax.nn.sigmoid(1.702 * h)
        else:
            h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class VisionTransformer(nn.Module):
    """ViT backbone returning (cls_token, patch_tokens).

    num_prompt_tokens > 0 appends learned prompt tokens after the patch
    sequence (the reference CLIP's prompt option, networks/model.py:223-243).
    """

    dim: int = 384
    depth: int = 12
    heads: int = 6
    patch: int = 16
    img_size: int = 224
    num_prompt_tokens: int = 0
    quick_gelu: bool = False
    dtype: Any = jnp.float32  # compute dtype (params stay fp32; position
    # embeddings are interpolated in fp32, attention softmax forced fp32)

    @nn.compact
    def __call__(self, x, train: bool = False, valid_hw=None):
        """``valid_hw``: optional [B, 2] TRUE input extents for bucketed
        extraction.  CONTRACT: extents must be multiples of ``patch``
        (SAME padding would otherwise shift the patch grid: the exact-
        shape run splits its pad top/bottom, the bucket pads bottom only).
        """
        B, H, W, _ = x.shape
        x = x.astype(self.dtype)
        y = nn.Conv(
            self.dim, (self.patch,) * 2, strides=(self.patch,) * 2,
            use_bias=False, dtype=self.dtype, name="patch_embed",
        )(x)
        gh, gw = y.shape[1], y.shape[2]
        y = y.reshape(B, gh * gw, self.dim)

        patch_ext = patch_mask = None
        if valid_hw is not None:
            from research_image_retrieval_tpu.ops.masking import token_mask

            patch_ext = jnp.asarray(valid_hw, jnp.int32) // self.patch
            patch_mask = token_mask(gh, gw, patch_ext)  # [B, gh*gw]

        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.dim)
        )
        npos = (self.img_size // self.patch) ** 2 + 1
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, npos, self.dim)
        )
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        native = self.img_size // self.patch
        if patch_ext is not None:
            # per-image interpolation to the TRUE patch grid, placed in
            # the padded canvas (matches the exact-shape resize below)
            from research_image_retrieval_tpu.ops.masking import (
                dynamic_resize_weights,
            )

            grid = patch_pos.reshape(native, native, self.dim)
            wh = dynamic_resize_weights(gh, native, patch_ext[:, 0])
            ww = dynamic_resize_weights(gw, native, patch_ext[:, 1])
            pos_b = jnp.einsum("bhp,pqc,bwq->bhwc", wh, grid, ww,
                               preferred_element_type=jnp.float32)
            y = y + pos_b.reshape(B, gh * gw, self.dim).astype(y.dtype)
        else:
            if (gh, gw) != (native, native):
                grid = patch_pos.reshape(1, native, native, self.dim)
                grid = jax.image.resize(grid, (1, gh, gw, self.dim), "bilinear")
                patch_pos = grid.reshape(1, gh * gw, self.dim)
            y = y + patch_pos.astype(y.dtype)
        tokens = [
            jnp.broadcast_to(cls + cls_pos, (B, 1, self.dim)).astype(y.dtype),
            y,
        ]
        if self.num_prompt_tokens:
            prompts = self.param(
                "prompt_tokens", nn.initializers.normal(0.02),
                (1, self.num_prompt_tokens, self.dim),
            )
            tokens.append(jnp.broadcast_to(
                prompts, (B, self.num_prompt_tokens, self.dim)
            ).astype(y.dtype))
        y = jnp.concatenate(tokens, axis=1)

        tmask = None
        if patch_mask is not None:
            ones = jnp.ones((B, 1), patch_mask.dtype)
            parts = [ones, patch_mask]  # CLS is always valid
            if self.num_prompt_tokens:
                parts.append(jnp.ones((B, self.num_prompt_tokens),
                                      patch_mask.dtype))
            tmask = jnp.concatenate(parts, axis=1)  # [B, N]

        y = (
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(y)
            if self.quick_gelu else y
        )  # CLIP
        for i in range(self.depth):
            y = ViTBlock(
                self.dim, self.heads, quick_gelu=self.quick_gelu,
                dtype=self.dtype, name=f"block{i}",
            )(y, deterministic=not train, token_mask=tmask)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(y)
        return y[:, 0], y[:, 1 : 1 + gh * gw]


class ViTGlobalModel(nn.Module):
    """ViT retrieval model: CLS + GeM-token pooling descriptor + ArcFace.

    descriptor = whiten(concat(cls, gem_p over patch tokens)) — the
    BASELINE config-3 recipe.
    """

    variant: str = "s16"
    outputdim: int = 512
    num_classes: int = 81313
    p: float = 3.0
    s: float = 32.0
    m: float = 0.15
    img_size: int = 224
    quick_gelu: bool = False
    dtype: Any = jnp.float32

    @property
    def extent_multiple(self) -> int:
        """Grid alignment contract for bucketed masked extraction: true
        extents must be multiples of the patch size (extract_vectors
        snaps them — see index/extract.py)."""
        return VIT_CONFIGS[self.variant]["patch"]

    def setup(self):
        cfg = VIT_CONFIGS[self.variant]
        self.backbone = VisionTransformer(
            img_size=self.img_size, quick_gelu=self.quick_gelu,
            dtype=self.dtype, **cfg
        )
        self.whiten = nn.Dense(self.outputdim, name="whiten")
        self.classifier_w = self.param(
            "classifier_w",
            nn.initializers.xavier_uniform(),
            (self.num_classes, self.outputdim),
        )

    def _descriptor(self, x, train: bool, valid_hw=None):
        cls, patches = self.backbone(x, train=train, valid_hw=valid_hw)
        cls = cls.astype(jnp.float32)  # descriptor head stays fp32
        xp = jnp.clip(patches.astype(jnp.float32), min=1e-6) ** self.p
        # GeM over tokens: clamp^p -> mean over sequence -> ^(1/p)
        if valid_hw is None:
            gem = jnp.mean(xp, axis=1) ** (1.0 / self.p)
        else:
            from research_image_retrieval_tpu.ops.masking import token_mask

            gh = x.shape[1] // self.backbone.patch
            gw = x.shape[2] // self.backbone.patch
            pm = token_mask(
                gh, gw, jnp.asarray(valid_hw, jnp.int32) // self.backbone.patch
            )
            cnt = jnp.maximum(jnp.sum(pm, axis=1, keepdims=True), 1.0)
            gem = (
                jnp.sum(xp * pm[..., None], axis=1) / cnt
            ) ** (1.0 / self.p)
        return self.whiten(jnp.concatenate([cls, gem], axis=-1))

    def __call__(self, x, labels, train: bool = True):
        feat = self._descriptor(x, train)
        # margin only at train; eval logits are plain scaled cosine
        logits = arcface_logits(
            feat, self.classifier_w, labels, s=self.s,
            m=self.m if train else 0.0,
        )
        return cross_entropy(logits, labels), logits

    def extract(self, x, valid_hw=None):
        """L2-normalized descriptor.

        ``valid_hw``: [B, 2] TRUE extents for bucketed extraction; must
        be multiples of the patch size (see VisionTransformer contract).
        """
        return l2_normalize(
            self._descriptor(x, train=False, valid_hw=valid_hw)
        )


register_model(
    "vit_s16",
    description="ViT-S/16 global descriptor (CLS + GeM tokens) with ArcFace",
    defaults=dict(variant="s16", outputdim=512),
    family="vit",
    paper="ViT/DINOv2-style transformer global descriptor (BASELINE config 3)",
)(ViTGlobalModel)

register_model(
    "vit_b16",
    description="ViT-B/16 global descriptor",
    defaults=dict(variant="b16", outputdim=768),
    family="vit",
)(ViTGlobalModel)

# NOTE: clip_vit_b32 / clip_r50 are registered in models/clip.py
# (CLIPGlobalModel) — real CLIP towers loadable from OpenAI checkpoints.
