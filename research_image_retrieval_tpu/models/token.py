"""Token retrieval model: transformer-refined object tokens over CNN features.

Behavioral contract of the reference Token / Token_Refine
(reference: networks/RetrievalNet.py:164-187, 290-313):

  1x1 conv 2048 -> mid_dim (+BN) over the stage-5 map, flatten HW tokens,
  1 Encoder layer, 4 learned object queries attend via
  softmax(q . x^T, axis=objects), Linear+LN token norm, 2 Decoder layers
  (cross+self attention), concat tokens -> Linear(mid*objects -> 1024) + BN;
  ArcFace s=sqrt(1024), m=0.2.

TPU notes: all attention is over HW tokens at stride 32 (1024 tokens at
imsize 1024) — static shapes per resolution bucket; fp32 attention matmuls.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from research_image_retrieval_tpu.models.backbone import ResNet, stage_extents
from research_image_retrieval_tpu.models.layers import Decoder, Encoder
from research_image_retrieval_tpu.models.registry import register_model
from research_image_retrieval_tpu.ops import (
    arcface_delg_logits,
    arcface_logits,
    cross_entropy,
    l2_normalize,
    token_mask as make_token_mask,
)

__all__ = ["TokenModel", "TokenRefine"]


class TokenRefine(nn.Module):
    """Object-query token refinement head (reference: RetrievalNet.py:164-187)."""

    num_heads: int = 8
    num_object: int = 4
    mid_dim: int = 1024
    encoder_layers: int = 1
    decoder_layers: int = 2
    qkv_bias: bool = True
    drop: float = 0.1
    attn_drop: float = 0.1
    drop_path: float = 0.1
    out_dim: int = 1024

    @nn.compact
    def __call__(self, fmap, train: bool = False, token_mask=None):
        B, H, W, _ = fmap.shape
        det = not train
        x = nn.Conv(self.mid_dim, (1, 1), use_bias=True, name="conv")(fmap)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="conv_bn",
        )(x)
        x = x.reshape(B, H * W, self.mid_dim)

        for i in range(self.encoder_layers):
            x = Encoder(
                self.mid_dim, self.num_heads, self.qkv_bias, self.drop,
                self.attn_drop, self.drop_path, name=f"encoder{i}",
            )(x, deterministic=det, train=train, key_mask=token_mask)

        query = self.param(
            "query",
            nn.initializers.normal(1.0),
            (1, self.num_object, self.mid_dim),
        )
        q = jnp.broadcast_to(query, (B, self.num_object, self.mid_dim))
        # attention over the OBJECT axis per spatial location
        # (reference softmax dim=1: RetrievalNet.py:181)
        attns = jnp.einsum(
            "bod,bnd->bon", q, x, preferred_element_type=jnp.float32
        )
        attns = nn.softmax(attns, axis=1)
        if token_mask is not None:
            # the token sum below runs over ALL HW positions; zero the
            # padded tokens' contributions (softmax here is per-token over
            # the object axis, so masking after softmax is exact)
            attns = attns * token_mask[:, None, :]
        token = jnp.einsum(
            "bon,bnd->bod", attns, x, preferred_element_type=jnp.float32
        )
        token = nn.Dense(self.mid_dim, name="token_norm_fc")(token)
        token = nn.LayerNorm(epsilon=1e-5, name="token_norm_ln")(token)

        for i in range(self.decoder_layers):
            token = Decoder(
                self.mid_dim, self.num_heads, self.qkv_bias, self.drop,
                self.attn_drop, self.drop_path, name=f"decoder{i}",
            )(token, x, deterministic=det, key_mask=token_mask)

        token = nn.Dense(self.out_dim, name="proj")(
            token.reshape(B, self.num_object * self.mid_dim)
        )
        token = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="proj_bn",
        )(token)
        return token


class TokenModel(nn.Module):
    """ResNet + Token_Refine + ArcFace (reference: RetrievalNet.py:290-313).

    ``use_delg_arcface=False`` (default) matches the reference Token class
    (plain ArcFace, RetrievalNet.py:296); True matches the reference
    RetrievalNet variant (ArcFace-DELG with the hard-example EMA buffer,
    RetrievalNet.py:271).
    """

    backbone_name: str = "resnet101"
    outputdim: int = 1024
    num_classes: int = 81313
    num_object: int = 4
    m: float = 0.2
    use_delg_arcface: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(
            name_=self.backbone_name,
            out_stages=(5,),
            dtype=self.dtype,
        )
        self.tr = TokenRefine(
            mid_dim=self.outputdim, num_object=self.num_object,
            out_dim=self.outputdim,
        )
        self.classifier_w = self.param(
            "classifier_w",
            nn.initializers.xavier_uniform(),
            (self.num_classes, self.outputdim),
        )
        if self.use_delg_arcface:
            # ArcFace-DELG hard-example EMA buffer (RetrievalNet.py:271);
            # lives in "model_state" and threads through the train step.
            self.t_var = self.variable(
                "model_state", "arcface_t", lambda: jnp.zeros((1,), jnp.float32)
            )

    def __call__(self, x, labels, train: bool = True):
        fmap = self.backbone(x, train=train)
        feat = self.tr(fmap, train=train)
        s = float(self.outputdim) ** 0.5
        if self.use_delg_arcface and train:
            logits, new_t = arcface_delg_logits(
                feat, self.classifier_w, labels, t_state=self.t_var.value,
                s=s, m=self.m,
            )
            if not self.is_initializing():
                self.t_var.value = new_t
        else:
            # margin (and DELG hard-example rescaling) only at train;
            # eval logits are plain scaled cosine
            logits = arcface_logits(
                feat, self.classifier_w, labels, s=s,
                m=self.m if train else 0.0,
            )
        return cross_entropy(logits, labels), logits

    def extract(self, x, valid_hw=None):
        """L2-normalized descriptor; ``valid_hw`` = [B, 2] input-pixel
        extents for bucketed variable-resolution extraction."""
        fmap = self.backbone(x, train=False, valid_hw=valid_hw)
        tmask = None
        if valid_hw is not None:
            ext = stage_extents(valid_hw, 5)
            tmask = make_token_mask(fmap.shape[1], fmap.shape[2], ext)
        return l2_normalize(self.tr(fmap, train=False, token_mask=tmask))


register_model(
    "token_r101",
    description="Token: transformer-refined object tokens over ResNet101 (reference RetrievalNet.py:290)",
    defaults=dict(backbone_name="resnet101", outputdim=1024),
    family="token",
    paper="Token-based representation (Wu et al.)",
    table1_names=("R101-Token",),
)(TokenModel)

register_model(
    "retrievalnet_r101",
    description="RetrievalNet: Token head with ArcFace-DELG hard-example EMA (reference RetrievalNet.py:263-286)",
    defaults=dict(backbone_name="resnet101", outputdim=1024,
                  use_delg_arcface=True),
    family="token",
)(TokenModel)

register_model(
    "token_r50",
    description="Token head over ResNet50",
    defaults=dict(backbone_name="resnet50", outputdim=1024),
    family="token",
    table1_names=("R50-Token",),
)(TokenModel)
