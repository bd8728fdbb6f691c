"""DOLG: deep orthogonal fusion of local and global features.

Behavioral contract of the reference DOLG
(reference: networks/RetrievalNet.py:367-517):

  global branch: GeM(stage-5) -> fc 2048->1024
  local branch:  SpatialAttention2d on stage-4 (1x1 conv -> BN ->
                 channel-L2-normalized map x softplus attention),
                 optional ASPP front
  fusion: subtract the projection of local onto the global vector
          (true orthogonal complement), average-pool, concat with global,
          fc -> 512; ArcFace s=30 m=0.15.

The projection is computed as einsums over the HW token axis (two MXU
matmuls), replacing the reference's bmm/reshape dance.
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
    avg_pool_all,
    cross_entropy,
    gem_pool,
    hw_mask,
    l2_normalize,
)

__all__ = ["DOLGModel", "SpatialAttention2d", "ASPP"]


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (reference: RetrievalNet.py:480-517)."""

    mid_c: int = 512
    out_c: int = 1024

    @nn.compact
    def __call__(self, x, mask=None):
        B, H, W, _ = x.shape
        # image-level pooling branch, broadcast back to HxW
        # (masked mean over real pixels when extracting padded buckets)
        pooled = avg_pool_all(x, valid_hw=mask)[:, None, None, :]
        pooled = nn.relu(nn.Conv(self.mid_c, (1, 1), name="im_pool_conv")(pooled))
        pooled = jnp.broadcast_to(pooled, (B, H, W, self.mid_c))

        if mask is not None:
            # re-zero the pad region so each dilated conv's boundary reads
            # match the exact-shape run's zero padding
            x = x * mask[..., None]
        branches = [pooled, nn.Conv(self.mid_c, (1, 1), name="aspp0")(x)]
        for i, d in enumerate((6, 12, 18)):
            branches.append(
                nn.Conv(
                    self.mid_c, (3, 3), kernel_dilation=(d, d),
                    padding=[(d, d), (d, d)], name=f"aspp{i + 1}",
                )(x)
            )
        y = jnp.concatenate(branches, axis=-1)
        return nn.relu(nn.Conv(self.out_c, (1, 1), name="conv_after")(y))


class SpatialAttention2d(nn.Module):
    """Softplus spatial attention over an L2-normalized feature map
    (reference: RetrievalNet.py:433-474)."""

    out_c: int = 1024
    with_aspp: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        if self.with_aspp:
            x = ASPP(name="aspp")(x, mask=mask)
        x = nn.Conv(self.out_c, (1, 1), name="conv1")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
        )(x)
        fmap_norm = l2_normalize(x, axis=-1)  # channel-wise L2
        att = nn.Conv(1, (1, 1), name="conv2")(nn.relu(x))
        att = jax.nn.softplus(att)
        return fmap_norm * att, att


class DOLGModel(nn.Module):
    """DOLG with true orthogonal fusion (reference: RetrievalNet.py:367-431)."""

    backbone_name: str = "resnet101"
    outputdim: int = 512
    num_classes: int = 81313
    with_aspp: bool = False
    s: float = 30.0
    m: float = 0.15
    # MSRA/pycls stride placement — the reference's scratch DOLG backbone
    # (ResStemIN/ResStage, networks/backbone.py:218-346); port its
    # checkpoints via backbone.convert_pycls_resnet
    scratch_backbone: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(
            name_=self.backbone_name,
            out_stages=(4, 5),
            stride_on_conv1=self.scratch_backbone,
            dtype=self.dtype,
        )
        self.local_attn = SpatialAttention2d(1024, with_aspp=self.with_aspp)
        self.fc_t = nn.Dense(1024, name="fc_t")
        self.fc = nn.Dense(self.outputdim, name="fc")
        self.classifier_w = self.param(
            "classifier_w",
            nn.initializers.xavier_uniform(),
            (self.num_classes, self.outputdim),
        )

    def _descriptor(self, x, train: bool, valid_hw=None):
        taps = self.backbone(x, train=train, valid_hw=valid_hw)
        f4, f5 = taps[4], taps[5]
        mask4 = mask5 = None
        if valid_hw is not None:
            e4 = stage_extents(valid_hw, 4)
            e5 = stage_extents(valid_hw, 5)
            mask4 = hw_mask(f4.shape[1], f4.shape[2], e4)
            mask5 = hw_mask(f5.shape[1], f5.shape[2], e5)
        fl, _ = self.local_attn(f4, train=train, mask=mask4)  # [B, H, W, 1024]

        fg = self.fc_t(gem_pool(f5, p=3.0, valid_hw=mask5))  # [B, 1024]
        fg_sq = jnp.sum(fg * fg, axis=-1, keepdims=True)  # ||fg||^2 [B,1]

        # projection of each local vector onto fg: (fl . fg) fg / ||fg||^2
        coef = jnp.einsum(
            "bhwc,bc->bhw", fl, fg, preferred_element_type=jnp.float32
        )
        proj = coef[..., None] * fg[:, None, None, :] / fg_sq[:, None, None, :]
        orth = fl - proj

        fo = avg_pool_all(orth, valid_hw=mask4)  # [B, 1024]
        return self.fc(jnp.concatenate([fg, fo], axis=-1))

    def __call__(self, x, labels, train: bool = True):
        feat = self._descriptor(x, train)
        # margin only at train; eval logits are plain scaled cosine
        logits = arcface_logits(
            feat, self.classifier_w, labels, s=self.s,
            m=self.m if train else 0.0,
        )
        return cross_entropy(logits, labels), logits

    def extract(self, x, valid_hw=None):
        """L2-normalized descriptor; ``valid_hw`` = [B, 2] input-pixel
        extents for bucketed variable-resolution extraction."""
        return l2_normalize(self._descriptor(x, train=False, valid_hw=valid_hw))


register_model(
    "dolg_r101",
    description="DOLG orthogonal local/global fusion over ResNet101 (reference RetrievalNet.py:367)",
    defaults=dict(backbone_name="resnet101", outputdim=512),
    family="dolg",
    paper="Yang et al., DOLG (ICCV 2021)",
    table1_names=("R101-DOLG",),
)(DOLGModel)

register_model(
    "dolg_r50",
    description="DOLG over ResNet50",
    defaults=dict(backbone_name="resnet50", outputdim=512),
    family="dolg",
    table1_names=("R50-DOLG",),
)(DOLGModel)

register_model(
    "dolg_r101_scratch",
    description="DOLG over the reference's scratch pycls-style ResNet101 (MSRA stride placement; reference networks/backbone.py:218-346) — checkpoint-portable via convert_pycls_resnet",
    defaults=dict(backbone_name="resnet101", outputdim=512,
                  scratch_backbone=True),
    family="dolg",
)(DOLGModel)
