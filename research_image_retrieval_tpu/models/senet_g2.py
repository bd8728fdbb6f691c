"""SENet-G2+: scratch SE-ResNet backbone with learnable-affine GeM pooling.

Behavioral contract of the reference (models/senet_g2.py:12-275): an
SE-Bottleneck ResNet (squeeze-and-excitation channel gating after conv3 of
every bottleneck), G2+ pooling (GeM with learnable power p plus learnable
affine alpha*. + beta), linear projection, CE classifier.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.models.registry import register_model
from research_image_retrieval_tpu.ops.masking import ceil_half, hw_mask
from research_image_retrieval_tpu.ops import (
    avg_pool_all,
    cross_entropy,
    gem_pool,
    l2_normalize,
)

__all__ = ["SENetG2Model", "SEBottleneck"]


class SEBlock(nn.Module):
    """Squeeze-and-excitation gate (reference: models/senet_g2.py:12-29).

    ``mask``: optional [B, H, W] validity — the squeeze mean runs over
    real pixels only (padded-bucket extraction)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x, mask=None):
        C = x.shape[-1]
        y = avg_pool_all(x, valid_hw=mask)  # [B, C]
        y = nn.relu(nn.Dense(C // self.reduction, use_bias=False, name="fc1")(y))
        y = jax.nn.sigmoid(nn.Dense(C, use_bias=False, name="fc2")(y))
        return x * y[:, None, None, :]


class SEBottleneck(nn.Module):
    """SE bottleneck block (reference: models/senet_g2.py:32-72)."""

    width: int
    stride: int = 1
    reduction: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False, extents=None):
        out_ch = self.width * 4
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name=name,
        )

        def remask(y, ext):
            if ext is None:
                return y
            return y * hw_mask(y.shape[1], y.shape[2], ext,
                               dtype=y.dtype)[..., None]

        idt = x
        y = nn.relu(norm("bn1")(nn.Conv(self.width, (1, 1), use_bias=False,
                                        name="conv1")(x)))
        # BN bias leaks into the pad region; re-zero before the only
        # spatial conv so its boundary reads are exact zero padding
        y = remask(y, extents)
        y = nn.relu(
            norm("bn2")(
                nn.Conv(self.width, (3, 3), strides=(self.stride,) * 2,
                        padding=1, use_bias=False, name="conv2")(y)
            )
        )
        out_ext = (
            ceil_half(extents)
            if extents is not None and self.stride == 2 else extents
        )
        y = norm("bn3")(nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(y))
        se_mask = (
            None if out_ext is None
            else hw_mask(y.shape[1], y.shape[2], out_ext)
        )
        y = SEBlock(self.reduction, name="se")(y, mask=se_mask)
        if idt.shape[-1] != out_ch or self.stride != 1:
            idt = norm("down_bn")(
                nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, name="down_conv")(idt)
            )
        return nn.relu(y + idt)


class SENetG2Model(nn.Module):
    """SE-ResNet + G2+ pooling (reference: models/senet_g2.py:156-230)."""

    layers: Sequence[int] = (3, 4, 6, 3)
    outputdim: int = 2048
    num_classes: int = 81313
    reduction: int = 16
    gem_p: float = 3.0
    dtype: Any = jnp.float32

    def setup(self):
        self.stem_conv = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                                 use_bias=False, name="conv1")
        # axis_name only takes effect when batch stats are computed
        # (train), so it is safe to set unconditionally here
        self.stem_bn = nn.BatchNorm(
            momentum=0.9, epsilon=1e-5, name="bn1"
        )
        blocks = []
        for i, (d, w) in enumerate(zip(self.layers, (64, 128, 256, 512))):
            for j in range(d):
                blocks.append(
                    SEBottleneck(
                        width=w,
                        stride=2 if (j == 0 and i > 0) else 1,
                        reduction=self.reduction,
                        name=f"layer{i + 1}_{j}",
                    )
                )
        self.blocks = blocks
        self.p_param = self.param(
            "gem_p", lambda _: jnp.asarray([self.gem_p], jnp.float32)
        )
        self.g2_alpha = self.param("g2_alpha", nn.initializers.ones, (1,))
        self.g2_beta = self.param("g2_beta", nn.initializers.zeros, (1,))
        self.feature_proj = nn.Dense(self.outputdim, name="feature_proj")
        self.classifier = nn.Dense(self.num_classes, name="classifier")

    def _features(self, x, train: bool, valid_hw=None):
        ext = None
        if valid_hw is not None:
            ext = jnp.asarray(valid_hw, jnp.int32)
            x = x * hw_mask(x.shape[1], x.shape[2], ext,
                            dtype=x.dtype)[..., None]
        y = self.stem_bn(self.stem_conv(x), use_running_average=not train)
        y = nn.relu(y)
        if ext is not None:
            ext = ceil_half(ext)
            # post-ReLU values are >= 0: zeroed padding can't win the max
            y = y * hw_mask(y.shape[1], y.shape[2], ext,
                            dtype=y.dtype)[..., None]
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        if ext is not None:
            ext = ceil_half(ext)
        for block in self.blocks:
            y = block(y, train=train, extents=ext)
            if ext is not None and block.stride == 2:
                ext = ceil_half(ext)
        mask = (
            None if ext is None
            else hw_mask(y.shape[1], y.shape[2], ext)
        )
        # G2+ pooling: GeM(learnable p) then learnable affine
        pooled = (
            self.g2_alpha * gem_pool(y, p=self.p_param, valid_hw=mask)
            + self.g2_beta
        )
        return self.feature_proj(pooled)

    def __call__(self, x, labels, train: bool = True):
        feat = self._features(x, train)
        logits = self.classifier(feat)
        return cross_entropy(logits, labels), logits

    def extract(self, x, valid_hw=None):
        """L2-normalized descriptor; ``valid_hw`` = [B, 2] input-pixel
        extents for bucketed variable-resolution extraction."""
        return l2_normalize(self._features(x, train=False,
                                           valid_hw=valid_hw))


register_model(
    "senet_g2_r50",
    description="SE-ResNet50 with G2+ learnable-affine GeM pooling (reference models/senet_g2.py:156)",
    defaults=dict(layers=(3, 4, 6, 3)),
    family="senet_g2",
    table1_names=("SENet-G2+",),
)(SENetG2Model)
