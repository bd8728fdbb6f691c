"""SoSNet: second-order (covariance) pooling retrieval model.

Behavioral contract of the reference (models/sosnet.py:12-236): optional
per-position similarity attention (MLP -> sigmoid), 1x1 projection to
``second_order_dim``, covariance over HW tokens (unbiased, N-1), upper-tri
flatten (C*(C+1)/2), L2 normalize, then a 2-layer MLP projection with
dropout and a CE classifier.

The covariance is one batched MXU matmul over tokens; the upper-tri gather
uses a precomputed static index set.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from research_image_retrieval_tpu.models.backbone import ResNet, stage_extents
from research_image_retrieval_tpu.models.registry import register_model
from research_image_retrieval_tpu.ops import cross_entropy, hw_mask, l2_normalize

__all__ = ["SoSNetModel", "second_order_pool"]


def second_order_pool(x: jnp.ndarray, valid_hw=None) -> jnp.ndarray:
    """Upper-triangular covariance descriptor of an NHWC map.

    x: [B, H, W, C] -> [B, C*(C+1)/2], L2-normalized
    (reference: models/sosnet.py:27-55).  ``valid_hw``: optional [B, H, W]
    mask restricting the covariance to real (non-padded) positions —
    masked mean/centering/normalization give the exact-shape result on
    the valid tokens.
    """
    B, H, W, C = x.shape
    n = H * W
    tokens = x.reshape(B, n, C).astype(jnp.float32)
    if valid_hw is None:
        centered = tokens - jnp.mean(tokens, axis=1, keepdims=True)
        denom = max(n - 1, 1)
    else:
        m = valid_hw.astype(jnp.float32).reshape(B, n, 1)
        cnt = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(tokens * m, axis=1, keepdims=True) / cnt
        centered = (tokens - mean) * m  # zero pad tokens out of the cov
        denom = jnp.maximum(cnt[:, 0] - 1.0, 1.0)  # [B, 1]
    cov = jnp.einsum(
        "bnc,bnd->bcd", centered, centered, preferred_element_type=jnp.float32
    ) / (denom if valid_hw is None else denom[:, :, None])
    iu = np.triu_indices(C)
    flat = cov[:, iu[0], iu[1]]
    return l2_normalize(flat, axis=-1)


class SoSNetModel(nn.Module):
    """SoSNet (reference: models/sosnet.py:95-236)."""

    backbone_name: str = "resnet50"
    outputdim: int = 2048
    second_order_dim: int = 512
    num_classes: int = 81313
    use_attention: bool = True
    dropout: float = 0.5
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(
            name_=self.backbone_name,
            out_stages=(5,),
            dtype=self.dtype,
        )
        self.so_proj = nn.Conv(self.second_order_dim, (1, 1), name="so_proj")
        self.attn_fc1 = nn.Dense(512, name="attn_fc1")
        self.attn_fc2 = nn.Dense(256, name="attn_fc2")
        self.attn_fc3 = nn.Dense(1, name="attn_fc3")
        self.proj_fc1 = nn.Dense(self.outputdim, name="proj_fc1")
        self.proj_fc2 = nn.Dense(self.outputdim, name="proj_fc2")
        self.drop = nn.Dropout(self.dropout)
        self.classifier = nn.Dense(self.num_classes, name="classifier")

    def _features(self, x, train: bool, valid_hw=None):
        fmap = self.backbone(x, train=train, valid_hw=valid_hw)
        mask = None
        if valid_hw is not None:
            ext = stage_extents(valid_hw, 5)
            mask = hw_mask(fmap.shape[1], fmap.shape[2], ext)
        if self.use_attention:
            a = nn.relu(self.attn_fc1(fmap))
            a = nn.relu(self.attn_fc2(a))
            a = jax.nn.sigmoid(self.attn_fc3(a))  # [B, H, W, 1]
            fmap = fmap * a
        # so_proj's bias leaks into pad positions; the masked covariance
        # excludes them exactly
        so = second_order_pool(self.so_proj(fmap), valid_hw=mask)
        h = nn.relu(self.proj_fc1(so))
        h = self.drop(h, deterministic=not train)
        return self.proj_fc2(h)

    def __call__(self, x, labels, train: bool = True):
        feat = self._features(x, train)
        logits = self.classifier(feat)
        return cross_entropy(logits, labels), logits

    def extract(self, x, valid_hw=None):
        """L2-normalized descriptor; ``valid_hw`` = [B, 2] input-pixel
        extents for bucketed variable-resolution extraction."""
        return l2_normalize(self._features(x, train=False, valid_hw=valid_hw))


register_model(
    "sosnet_r50",
    description="SoSNet second-order covariance pooling (reference models/sosnet.py:95)",
    defaults=dict(backbone_name="resnet50", second_order_dim=128),
    family="sosnet",
    table1_names=("R50-SoSNet",),
)(SoSNetModel)
