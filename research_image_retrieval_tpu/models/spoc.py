"""SpoC: spatial-pyramid pooling with contextual attention.

Behavioral contract of the reference (models/spoc.py:12-249): optional
contextual attention (two 3x3 conv+BN+ReLU context encoder, sigmoid
attention, concat + 1x1 refine), max-pool spatial pyramid over levels
(1, 2, 4), a Conv1d+BN+ReLU aggregation over the region axis followed by
adaptive max-pool, then a 2-layer MLP with dropout and a CE classifier.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.models.backbone import ResNet
from research_image_retrieval_tpu.models.registry import register_model
from research_image_retrieval_tpu.ops import cross_entropy, l2_normalize

__all__ = ["SpoCModel", "spatial_pyramid_pool"]


def spatial_pyramid_pool(x: jnp.ndarray, levels: Sequence[int] = (1, 2, 4)):
    """Max-pool pyramid over an NHWC map -> [B, total_regions, C].

    torch max_pool2d semantics: kernel = stride = floor(dim/level), no
    padding (reference: models/spoc.py:20-49).
    """
    B, H, W, C = x.shape
    outs = []
    for level in levels:
        kh, kw = max(H // level, 1), max(W // level, 1)
        pooled = jax.lax.reduce_window(
            x,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1, kh, kw, 1),
            window_strides=(1, kh, kw, 1),
            padding="VALID",
        )
        outs.append(pooled.reshape(B, -1, C))
    return jnp.concatenate(outs, axis=1)


class SpoCModel(nn.Module):
    """SpoC (reference: models/spoc.py:97-249)."""

    backbone_name: str = "resnet50"
    outputdim: int = 2048
    context_dim: int = 512
    pyramid_levels: tuple = (1, 2, 4)
    use_context: bool = True
    num_classes: int = 81313
    dropout: float = 0.5
    bn_axis_name: str | None = None
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(
            name_=self.backbone_name,
            out_stages=(5,),
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )
        self.ctx_conv1 = nn.Conv(self.context_dim, (3, 3), padding=1, name="ctx_conv1")
        self.ctx_conv2 = nn.Conv(self.context_dim, (3, 3), padding=1, name="ctx_conv2")
        self.ctx_attn = nn.Conv(1, (1, 1), name="ctx_attn")
        self.agg_proj = nn.Dense(self.outputdim, name="agg_proj")
        self.proj_fc1 = nn.Dense(self.outputdim, name="proj_fc1")
        self.proj_fc2 = nn.Dense(self.outputdim, name="proj_fc2")
        self.classifier = nn.Dense(self.num_classes, name="classifier")

    @nn.compact_name_scope
    def _context(self, fmap, train: bool):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        ctx = nn.relu(bn("ctx_bn1")(self.ctx_conv1(fmap)))
        ctx = nn.relu(bn("ctx_bn2")(self.ctx_conv2(ctx)))
        att = jax.nn.sigmoid(self.ctx_attn(ctx))
        combined = jnp.concatenate([fmap * att, ctx], axis=-1)
        refined = nn.Conv(fmap.shape[-1], (1, 1), name="refine_conv")(combined)
        return refined

    @nn.compact_name_scope
    def _features(self, x, train: bool):
        fmap = self.backbone(x, train=train)
        if self.use_context:
            fmap = self._context(fmap, train)
        pyr = spatial_pyramid_pool(fmap, self.pyramid_levels)  # [B, R, C]
        # Conv1d(backbone_dim -> outputdim, k=1) over regions == Dense per region
        agg = self.agg_proj(pyr)  # [B, R, outputdim]
        agg = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="agg_bn",
        )(agg)
        agg = nn.relu(agg)
        feat = jnp.max(agg, axis=1)  # adaptive max-pool over regions
        h = nn.relu(self.proj_fc1(feat))
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return self.proj_fc2(h)

    def __call__(self, x, labels, train: bool = True):
        feat = self._features(x, train)
        logits = self.classifier(feat)
        return cross_entropy(logits, labels), logits

    def extract(self, x, valid_hw=None):
        if valid_hw is not None:
            raise NotImplementedError(
                "masked-bucket extraction is not supported by this "
                "model; batch images of one resolution instead"
            )
        return l2_normalize(self._features(x, train=False))


register_model(
    "spoc_r50",
    description="SpoC spatial pyramid + contextual attention (reference models/spoc.py:97)",
    defaults=dict(backbone_name="resnet50"),
    family="spoc",
    table1_names=("R50-SpoC",),
)(SpoCModel)
