"""CVNet reranker: cross-scale 4D correlation verification.

Behavioral contract of the reference (models/cvnet_modules/
CVNet_Rerank_model.py:17-75, CVlearner.py:11-69).  The reference imports
its 4D convolution and correlation builders from HSNet files that are
missing from the repo (CVNet_Rerank_model.py:11-15), so those pieces are
re-derived here from their published semantics:

* ``CenterPivotConv4d`` — a 4D convolution over (query HxW, key HxW)
  decomposed into two 2D convolutions: one over the query plane (key dims
  folded into batch, key dims strided by subsampling) and one over the key
  plane (query dims folded into batch, then subsampled); outputs summed.
  Each 2D conv is an MXU-friendly dense conv.
* cross-scale correlation — the stage-4 feature map is resized to scales
  {0.25, 0.5, 1.0}, compressed to 256ch by per-scale 3x3 convs,
  channel-L2-normalized; all 9 (query-scale x key-scale) cosine
  correlation volumes are resized to the scale-1.0 geometry and stacked as
  channels of a 6D tensor [B, Hq, Wq, Hk, Wk, 9].
* ``CVLearner`` — 4 stacks of CenterPivotConv4d + GroupNorm + ReLU with
  progressive striding, global mean pool, 2-way MLP; softmax[..., 1] is
  the match score.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.models.backbone import ResNet, stage_extents
from research_image_retrieval_tpu.ops import gem_pool, hw_mask, l2_normalize

__all__ = ["CVNetRerank", "CVLearner", "CenterPivotConv4d"]


class CenterPivotConv4d(nn.Module):
    """4D conv as two pivoted 2D convs (HSNet semantics)."""

    features: int
    kernel: int = 3
    query_stride: int = 1
    key_stride: int = 1

    @nn.compact
    def __call__(self, x):
        """x: [B, ha, wa, hb, wb, C] -> [B, ha', wa', hb', wb', features]."""
        B, ha, wa, hb, wb, C = x.shape
        k, qs, ks = self.kernel, self.query_stride, self.key_stride

        conv_q = nn.Conv(
            self.features, (k, k), strides=(qs, qs), padding="SAME",
            use_bias=False, name="conv_query",
        )
        conv_k = nn.Conv(
            self.features, (k, k), strides=(ks, ks), padding="SAME",
            use_bias=True, name="conv_key",
        )

        # branch 1: subsample key dims, convolve over query plane
        x1 = x[:, :, :, ::ks, ::ks, :]
        hb2, wb2 = x1.shape[3], x1.shape[4]
        x1 = x1.transpose(0, 3, 4, 1, 2, 5).reshape(B * hb2 * wb2, ha, wa, C)
        o1 = conv_q(x1)
        ha2, wa2 = o1.shape[1], o1.shape[2]
        o1 = o1.reshape(B, hb2, wb2, ha2, wa2, self.features)
        o1 = o1.transpose(0, 3, 4, 1, 2, 5)

        # branch 2: convolve over key plane, subsample query dims
        x2 = x.reshape(B * ha * wa, hb, wb, C)
        o2 = conv_k(x2)
        o2 = o2.reshape(B, ha, wa, o2.shape[1], o2.shape[2], self.features)
        o2 = o2[:, ::qs, ::qs]

        return o1 + o2


class CVLearner(nn.Module):
    """4-stage 4D-conv encoder -> 2-way match logits
    (reference: CVlearner.py:11-68)."""

    in_channels: int = 9
    groups: int = 4

    @nn.compact
    def __call__(self, corr):
        def block(x, specs, name):
            for i, (outch, ksz, qstr, kstr) in enumerate(specs):
                x = CenterPivotConv4d(
                    outch, ksz, qstr, kstr, name=f"{name}_conv{i}"
                )(x)
                x = nn.GroupNorm(num_groups=self.groups, name=f"{name}_gn{i}")(x)
                x = nn.relu(x)
            return x

        c1, c2, c3, c4 = 16, 32, 64, 128
        x = block(corr, [(c1, 5, 2, 2)], "block1")
        x = block(x, [(c1, 3, 1, 1), (c2, 3, 2, 2)], "block2")
        x = block(x, [(c2, 3, 1, 1), (c2, 3, 1, 1), (c3, 3, 2, 2)], "block3")
        x = block(x, [(c3, 3, 1, 1), (c3, 3, 1, 1), (c4, 3, 1, 1)], "block4")

        pooled = jnp.mean(x, axis=(1, 2, 3, 4))  # [B, c4]
        h = nn.relu(nn.Dense(c4, name="mlp_fc1")(pooled))
        return nn.Dense(2, name="mlp_fc2")(h)


class CVNetRerank(nn.Module):
    """Pairwise correlation-verification reranker
    (reference: CVNet_Rerank_model.py:17-75)."""

    backbone_name: str = "resnet50"
    reduction_dim: int = 256
    scales: Sequence[float] = (0.25, 0.5, 1.0)

    def setup(self):
        self.encoder = ResNet(
            name_=self.backbone_name, out_stages=(4, 5),
        )
        self.compress = [
            nn.Conv(self.reduction_dim, (3, 3), padding=1, use_bias=False,
                    name=f"compress{i}")
            for i in range(len(self.scales))
        ]
        self.cv_learner = CVLearner(
            in_channels=len(self.scales) ** 2, name="cv_learner"
        )

    def extract_featuremap(self, img):
        """Stage-4 feature map for cached-feature reranking."""
        return self.encoder(img, train=False)[4]

    def _pyramid(self, fmap):
        """Per-scale compressed, channel-normalized features."""
        B, H, W, C = fmap.shape
        outs = []
        for i, s in enumerate(self.scales):
            h, w = max(int(H * s), 1), max(int(W * s), 1)
            scaled = (
                fmap
                if s == 1.0
                else jax.image.resize(fmap, (B, h, w, C), "bilinear")
            )
            outs.append(l2_normalize(self.compress[i](scaled), axis=-1))
        return outs

    def build_correlation(self, q_fmap, k_fmap):
        """Cross-scale cosine correlation volume [B, Hq, Wq, Hk, Wk, S*S]."""
        qs = self._pyramid(q_fmap)
        ks = self._pyramid(k_fmap)
        B = q_fmap.shape[0]
        Hq, Wq = qs[-1].shape[1], qs[-1].shape[2]  # scale-1.0 geometry
        Hk, Wk = ks[-1].shape[1], ks[-1].shape[2]
        vols = []
        for q in qs:
            for k in ks:
                corr = jnp.einsum(
                    "bijc,bklc->bijkl", q, k,
                    preferred_element_type=jnp.float32,
                )
                corr = jnp.maximum(corr, 0.0)  # clamp negatives (HSNet)
                corr = jax.image.resize(
                    corr, (B, Hq, Wq, Hk, Wk), "bilinear"
                )
                vols.append(corr)
        return jnp.stack(vols, axis=-1)

    def score_from_featuremaps(self, q_fmap, k_fmap):
        corr = self.build_correlation(q_fmap, k_fmap)
        logits = self.cv_learner(corr)
        return jax.nn.softmax(logits, axis=-1)[:, 1]

    def __call__(self, query_img, key_img):
        """Match score in [0, 1] per (query, key) pair."""
        q_fmap = self.extract_featuremap(query_img)
        k_fmap = self.extract_featuremap(key_img)
        return self.score_from_featuremaps(q_fmap, k_fmap)

    def extract(self, img, valid_hw=None):
        """Global descriptor from the frozen encoder (stage-5 GeM);
        ``valid_hw`` = [B, 2] extents for bucketed extraction."""
        f5 = self.encoder(img, train=False, valid_hw=valid_hw)[5]
        mask = None
        if valid_hw is not None:
            ext = stage_extents(valid_hw, 5)
            mask = hw_mask(f5.shape[1], f5.shape[2], ext)
        return l2_normalize(gem_pool(f5, p=3.0, valid_hw=mask))
