"""SOLAR: second-order attention + GeM retrieval model.

Behavioral contract of the reference SOLAR / SOABlock_GeM
(reference: networks/RetrievalNet.py:534-600):

  SOA block over stage-5: f,g = 1x1->mid(+BN+ReLU); h = 1x1->mid;
  attn = softmax(mid^-1/2 * f^T g) over HW x HW; z = attn @ h;
  v = 1x1 mid->C zero-initialized; residual add; GeM pool.
  Then channel L2 norm -> whiten -> ArcFace(s=sqrt(dim), m).

TPU notes: the second-order HWxHW attention is two batched MXU matmuls
over the flattened token axis; zero-init of v keeps the block an identity
at step 0 (as the reference's constant_init does).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.models.backbone import ResNet, stage_extents
from research_image_retrieval_tpu.models.registry import register_model
from research_image_retrieval_tpu.ops import (
    arcface_logits,
    cross_entropy,
    gem_pool,
    hw_mask,
    l2_normalize,
    mask_attn_logits,
)

__all__ = ["SOLARModel", "SOABlock"]


class SOABlock(nn.Module):
    """Second-order attention residual block (reference: RetrievalNet.py:534-569)."""

    k: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False, token_mask=None):
        B, H, W, C = x.shape
        mid = C // self.k
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        f = nn.relu(norm("f_bn")(nn.Conv(mid, (1, 1), name="f")(x)))
        g = nn.relu(norm("g_bn")(nn.Conv(mid, (1, 1), name="g")(x)))
        h = nn.Conv(mid, (1, 1), name="h")(x)

        fx = f.reshape(B, H * W, mid)
        gx = g.reshape(B, H * W, mid)
        hx = h.reshape(B, H * W, mid)
        attn = jnp.einsum(
            "bnm,bkm->bnk", fx, gx, preferred_element_type=jnp.float32
        ) * (mid**-0.5)
        if token_mask is not None:
            # bucketed extraction: drop padded keys from every softmax row
            attn = mask_attn_logits(attn, token_mask)
        attn = jax.nn.softmax(attn, axis=-1)
        z = jnp.einsum(
            "bnk,bkm->bnm", attn, hx, preferred_element_type=jnp.float32
        ).reshape(B, H, W, mid)
        z = nn.Conv(
            C, (1, 1),
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="v",
        )(z)
        return z + x


class SOLARModel(nn.Module):
    """SOLAR = backbone + SOA-GeM + whiten + ArcFace
    (reference: RetrievalNet.py:572-600)."""

    backbone_name: str = "resnet101"
    outputdim: int = 2048
    num_classes: int = 81313
    soa_k: int = 2
    m: float = 0.15
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(
            name_=self.backbone_name,
            out_stages=(5,),
            dtype=self.dtype,
        )
        self.soa = SOABlock(k=self.soa_k)
        self.whiten = nn.Dense(self.outputdim, name="whiten")
        self.classifier_w = self.param(
            "classifier_w",
            nn.initializers.xavier_uniform(),
            (self.num_classes, self.outputdim),
        )

    def _descriptor(self, x, train: bool, valid_hw=None):
        fmap = self.backbone(x, train=train, valid_hw=valid_hw)
        mask = tmask = None
        if valid_hw is not None:
            ext = stage_extents(valid_hw, 5)
            mask = hw_mask(fmap.shape[1], fmap.shape[2], ext)
            tmask = mask.reshape(mask.shape[0], -1)
        fmap = self.soa(fmap, train=train, token_mask=tmask)
        pooled = gem_pool(fmap, p=3.0, valid_hw=mask)
        # channel L2 before whitening (reference: RetrievalNet.py:587,596)
        return self.whiten(l2_normalize(pooled))

    def __call__(self, x, labels, train: bool = True):
        feat = self._descriptor(x, train)
        s = float(self.outputdim) ** 0.5
        logits = arcface_logits(feat, self.classifier_w, labels, s=s,
                                m=self.m if train else 0.0)
        return cross_entropy(logits, labels), logits

    def extract(self, x, valid_hw=None):
        return l2_normalize(self._descriptor(x, train=False, valid_hw=valid_hw))


register_model(
    "solar_r101",
    description="SOLAR second-order attention + GeM over ResNet101 (reference RetrievalNet.py:572)",
    defaults=dict(backbone_name="resnet101", outputdim=2048),
    family="solar",
    paper="Ng et al., SOLAR (ECCV 2020)",
    table1_names=("R101-SOLAR",),
)(SOLARModel)

register_model(
    "solar_r50",
    description="SOLAR over ResNet50",
    defaults=dict(backbone_name="resnet50", outputdim=2048),
    family="solar",
)(SOLARModel)
