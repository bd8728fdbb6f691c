"""DELG: unified global descriptor + attention-weighted local features.

Behavioral contract of the reference Table-1 DELG
(reference: models/delg.py:13-157): GeM-pooled global branch with a linear
projection and CE classifier; a local branch producing 1x1-conv local
features and a sigmoid attention map; ``extract_local_descriptors`` returns
channel-L2-normalized locals + flattened attention for reranking
(models/delg.py:109-124).
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

__all__ = ["DELGModel"]


class DELGModel(nn.Module):
    """DELG global + local features (reference: models/delg.py:32-124)."""

    backbone_name: str = "resnet50"
    outputdim: int = 2048
    local_dim: int = 1024
    num_classes: int = 81313
    p: float = 3.0
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(
            name_=self.backbone_name,
            out_stages=(5,),
            dtype=self.dtype,
        )
        self.global_proj = nn.Dense(self.outputdim, name="global_proj")
        self.local_conv = nn.Conv(self.local_dim, (1, 1), name="local_conv")
        self.attention_conv = nn.Conv(1, (1, 1), name="attention_conv")
        self.classifier = nn.Dense(self.num_classes, name="classifier")

    def _branches(self, x, train: bool, valid_hw=None):
        fmap = self.backbone(x, train=train, valid_hw=valid_hw)
        mask = None
        if valid_hw is not None:
            ext = stage_extents(valid_hw, 5)
            mask = hw_mask(fmap.shape[1], fmap.shape[2], ext)
        global_feat = self.global_proj(
            gem_pool(fmap, p=self.p, valid_hw=mask)
        )
        local_feat = self.local_conv(fmap)  # [B, H, W, local_dim]
        attention = jax.nn.sigmoid(self.attention_conv(fmap))  # [B, H, W, 1]
        return global_feat, local_feat, attention

    def __call__(self, x, labels, train: bool = True):
        global_feat, _, _ = self._branches(x, train)
        logits = self.classifier(global_feat)
        return cross_entropy(logits, labels), logits

    def extract(self, x, valid_hw=None):
        global_feat, _, _ = self._branches(x, train=False, valid_hw=valid_hw)
        return l2_normalize(global_feat)

    def extract_local(self, x):
        """Local descriptors for geometric reranking.

        Returns:
          (locals [B, H*W, local_dim] channel-L2-normalized,
           attention [B, H*W]) — reference models/delg.py:109-124.
        """
        _, local_feat, attention = self._branches(x, train=False)
        B, H, W, D = local_feat.shape
        locals_flat = local_feat.reshape(B, H * W, D)
        # reference normalizes over the CHANNEL axis of [B, C, HW] — i.e.
        # each spatial position's descriptor to unit norm
        locals_flat = l2_normalize(locals_flat, axis=-1)
        return locals_flat, attention.reshape(B, H * W)


register_model(
    "delg_r50",
    description="DELG global+local features over ResNet50 (reference models/delg.py:32)",
    defaults=dict(backbone_name="resnet50"),
    family="delg",
    paper="Cao et al., Unifying Deep Local and Global Features (ECCV 2020)",
    table1_names=("R50-DELG",),
)(DELGModel)

register_model(
    "delg_r101",
    description="DELG over ResNet101",
    defaults=dict(backbone_name="resnet101"),
    family="delg",
    table1_names=("R101-DELG",),
)(DELGModel)
