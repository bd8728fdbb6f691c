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

from research_image_retrieval_tpu.models.backbone import ResNet, stage_extents
from research_image_retrieval_tpu.models.registry import register_model
from research_image_retrieval_tpu.ops import cross_entropy, hw_mask, l2_normalize

__all__ = ["SpoCModel", "spatial_pyramid_pool", "masked_spatial_pyramid_pool"]


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


def masked_spatial_pyramid_pool(
    x: jnp.ndarray, extents: jnp.ndarray, levels: Sequence[int] = (1, 2, 4)
):
    """Per-image dynamic-window max-pool pyramid over padded buckets.

    Matches ``spatial_pyramid_pool`` of the exact-shape run on the valid
    region, INCLUDING torch's VALID-pooling region count: with kernel =
    stride = floor(true_dim / level) the exact run emits
    floor(true_dim / kernel) regions per dim — up to 2*level - 1, more
    than ``level`` for awkward sizes — and remainder pixels belong to no
    region.  Region ids are computed per image (dynamic division) and
    reduced with a batched segment max; non-existent regions are reported
    in the participation mask (they must be EXCLUDED from downstream
    region reductions, not filled — see SpoCModel._features).

    Returns:
      pyr: [B, sum((2*level-1)^2), C] region maxes (garbage where the
        participation mask is False).
      participate: [B, sum((2*level-1)^2)] bool.
    """
    B, H, W, C = x.shape
    x32 = x.astype(jnp.float32)
    h_t = extents[:, 0].astype(jnp.int32)  # [B]
    w_t = extents[:, 1].astype(jnp.int32)
    rows = jnp.arange(H)[None, :]  # [1, H]
    cols = jnp.arange(W)[None, :]
    pyr_parts, part_parts = [], []
    for level in levels:
        side = 2 * level - 1  # max regions per dim for this level
        nseg = side * side
        kh = jnp.maximum(h_t // level, 1)[:, None]  # [B, 1]
        kw = jnp.maximum(w_t // level, 1)[:, None]
        nr = jnp.minimum(h_t[:, None] // kh, side)  # [B, 1] real row-regions
        nc = jnp.minimum(w_t[:, None] // kw, side)
        ri = rows // kh  # [B, H]
        ci = cols // kw  # [B, W]
        # remainder rows/cols (beyond nr*kh) belong to NO region -> trash
        r_ok = (ri < nr) & (rows < h_t[:, None])
        c_ok = (ci < nc) & (cols < w_t[:, None])
        seg = ri[:, :, None] * side + ci[:, None, :]  # [B, H, W]
        ok = r_ok[:, :, None] & c_ok[:, None, :]
        seg = jnp.where(ok, seg, nseg)  # trash segment = nseg
        flat_seg = seg.reshape(B, H * W)
        flat_x = x32.reshape(B, H * W, C)

        def one(seg_b, x_b):
            return jax.ops.segment_max(
                x_b, seg_b, num_segments=nseg + 1,
                indices_are_sorted=False, unique_indices=False,
            )[:nseg]

        pyr_parts.append(jax.vmap(one)(flat_seg, flat_x))  # [B, nseg, C]
        grid_i = jnp.arange(side)[None, :, None]  # [1, side, 1]
        grid_j = jnp.arange(side)[None, None, :]
        part = (grid_i < nr[:, :, None]) & (grid_j < nc[:, :, None])
        part_parts.append(part.reshape(B, nseg))
    return (
        jnp.concatenate(pyr_parts, axis=1),
        jnp.concatenate(part_parts, axis=1),
    )


class SpoCModel(nn.Module):
    """SpoC (reference: models/spoc.py:97-249)."""

    backbone_name: str = "resnet50"
    outputdim: int = 2048
    context_dim: int = 512
    pyramid_levels: tuple = (1, 2, 4)
    use_context: bool = True
    num_classes: int = 81313
    dropout: float = 0.5
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(
            name_=self.backbone_name,
            out_stages=(5,),
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
    def _context(self, fmap, train: bool, mask=None):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        remask = (
            (lambda y: y) if mask is None
            else (lambda y: y * mask[..., None])
        )
        # re-zero the pad region before each 3x3 conv so its boundary
        # reads match the exact-shape run's zero padding
        ctx = nn.relu(bn("ctx_bn1")(self.ctx_conv1(remask(fmap))))
        ctx = nn.relu(bn("ctx_bn2")(self.ctx_conv2(remask(ctx))))
        att = jax.nn.sigmoid(self.ctx_attn(ctx))
        combined = jnp.concatenate([fmap * att, ctx], axis=-1)
        refined = nn.Conv(fmap.shape[-1], (1, 1), name="refine_conv")(combined)
        return refined

    @nn.compact_name_scope
    def _features(self, x, train: bool, valid_hw=None):
        fmap = self.backbone(x, train=train, valid_hw=valid_hw)
        mask = ext = None
        if valid_hw is not None:
            ext = stage_extents(valid_hw, 5)
            mask = hw_mask(fmap.shape[1], fmap.shape[2], ext)
        if self.use_context:
            fmap = self._context(fmap, train, mask=mask)
        part = None
        if ext is None:
            pyr = spatial_pyramid_pool(fmap, self.pyramid_levels)  # [B, R, C]
        else:
            pyr, part = masked_spatial_pyramid_pool(
                fmap, ext, self.pyramid_levels
            )
            # empty segments carry -inf; zero them so the Dense/BN below
            # stay finite (they are excluded from the region max anyway)
            pyr = jnp.where(part[..., None], pyr, 0.0)
        # Conv1d(backbone_dim -> outputdim, k=1) over regions == Dense per region
        agg = self.agg_proj(pyr)  # [B, R, outputdim]
        agg = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="agg_bn",
        )(agg)
        agg = nn.relu(agg)
        if part is not None:
            # regions the exact-shape run would not produce must not win
            agg = jnp.where(part[..., None], agg, -jnp.inf)
        feat = jnp.max(agg, axis=1)  # adaptive max-pool over regions
        h = nn.relu(self.proj_fc1(feat))
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return self.proj_fc2(h)

    def __call__(self, x, labels, train: bool = True):
        feat = self._features(x, train)
        logits = self.classifier(feat)
        return cross_entropy(logits, labels), logits

    def extract(self, x, valid_hw=None):
        """L2-normalized descriptor; ``valid_hw`` = [B, 2] input-pixel
        extents for bucketed variable-resolution extraction (maps must be
        >= max(pyramid_levels) on each side for region-exact equality)."""
        return l2_normalize(self._features(x, train=False,
                                           valid_hw=valid_hw))


register_model(
    "spoc_r50",
    description="SpoC spatial pyramid + contextual attention (reference models/spoc.py:97)",
    defaults=dict(backbone_name="resnet50"),
    family="spoc",
    table1_names=("R50-SpoC",),
)(SpoCModel)
