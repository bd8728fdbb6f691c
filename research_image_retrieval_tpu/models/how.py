"""HOW-VLAD / HOW-ASMK: aggregated local descriptors.

Behavioral contract of the reference (models/how_vlad.py:14-255), with the
Python loops re-derived as single XLA programs — the reference's per-cluster
VLAD loop (how_vlad.py:44-52) and O(B*N) ASMK double loop
(how_vlad.py:95-99) are semantic specs, not implementations:

* VLAD: soft-assign residual aggregation — one einsum over (tokens x
  clusters) instead of a K-loop.
* ASMK: nearest-centroid hard assignment, adaptive threshold
  (mean + std of min distances), selected tokens scatter-add their
  cluster's learnable weight — expressed as one_hot matmul (MXU-friendly
  segment sum).

Both heads sit on a 1x1-projected, position-L2-normalized local descriptor
field and feed a linear projection + CE classifier.
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
    l2_normalize,
    token_mask as make_token_mask,
)

__all__ = ["HOWModel", "vlad_aggregate", "asmk_aggregate"]


def vlad_aggregate(x: jnp.ndarray, centroids: jnp.ndarray, alpha: float = 100.0,
                   mask: jnp.ndarray | None = None):
    """Soft-assignment VLAD (reference semantics: how_vlad.py:30-58).

    x: [B, N, D] local descriptors; centroids: [K, D]; ``mask``: optional
    [B, N] token validity (padded-bucket extraction) — masked tokens
    contribute nothing to the aggregation.
    Returns L2-normalized [B, K*D].
    """
    B, N, D = x.shape
    K = centroids.shape[0]
    # pairwise Euclidean distances [B, N, K]
    d2 = (
        jnp.sum(x**2, -1, keepdims=True)
        - 2.0 * jnp.einsum("bnd,kd->bnk", x, centroids,
                           preferred_element_type=jnp.float32)
        + jnp.sum(centroids**2, -1)
    )
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
    assign = jax.nn.softmax(-alpha * dist, axis=2)  # [B, N, K]
    if mask is not None:
        assign = assign * mask.astype(assign.dtype)[..., None]
    # sum_n a[n,k] * (x[n] - c[k]) = (a^T x)[k] - (sum_n a[n,k]) c[k]
    ax = jnp.einsum("bnk,bnd->bkd", assign, x,
                    preferred_element_type=jnp.float32)
    mass = jnp.sum(assign, axis=1)  # [B, K]
    vlad = ax - mass[..., None] * centroids[None]
    return l2_normalize(vlad.reshape(B, K * D), axis=-1)


def asmk_aggregate(x: jnp.ndarray, centroids: jnp.ndarray, weights: jnp.ndarray,
                   mask: jnp.ndarray | None = None):
    """Selective match-kernel aggregation (reference semantics:
    how_vlad.py:75-104), vectorized.

    Each token is hard-assigned to its nearest centroid; tokens whose
    min-distance exceeds mean+std (per image) are dropped; each kept token
    adds its cluster's learnable weight.  ``mask``: optional [B, N] token
    validity — the mean/std threshold and the counts run over valid
    tokens only.  Returns L2-normalized [B, K].
    """
    d2 = (
        jnp.sum(x**2, -1, keepdims=True)
        - 2.0 * jnp.einsum("bnd,kd->bnk", x, centroids,
                           preferred_element_type=jnp.float32)
        + jnp.sum(centroids**2, -1)
    )
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))  # [B, N, K]
    nearest = jnp.argmin(dist, axis=2)  # [B, N]
    min_d = jnp.min(dist, axis=2)  # [B, N]
    # unbiased std like torch.std (reference: how_vlad.py:89); a single
    # token (N=1) would be 0/0 — degenerate case keeps everything
    n_tokens = min_d.shape[1]
    if mask is None:
        std = (
            jnp.std(min_d, 1, keepdims=True, ddof=1)
            if n_tokens > 1
            else jnp.zeros((min_d.shape[0], 1), min_d.dtype)
        )
        thresh = jnp.mean(min_d, 1, keepdims=True) + std
        keep = (min_d < thresh).astype(jnp.float32)  # [B, N]
    else:
        m = mask.astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(m, 1, keepdims=True), 1.0)
        mean = jnp.sum(min_d * m, 1, keepdims=True) / cnt
        var = jnp.sum(m * (min_d - mean) ** 2, 1, keepdims=True) / jnp.maximum(
            cnt - 1.0, 1.0
        )
        thresh = mean + jnp.sqrt(var)
        keep = ((min_d < thresh).astype(jnp.float32)) * m
    one_hot = jax.nn.one_hot(nearest, centroids.shape[0], dtype=jnp.float32)
    counts = jnp.einsum("bn,bnk->bk", keep, one_hot,
                        preferred_element_type=jnp.float32)
    return l2_normalize(counts * weights[None], axis=-1)


class HOWModel(nn.Module):
    """HOW local-descriptor model with VLAD or ASMK aggregation
    (reference: models/how_vlad.py:107-199)."""

    backbone_name: str = "resnet50"
    pooling_type: str = "vlad"  # or "asmk"
    local_dim: int = 128
    num_clusters: int = 64
    outputdim: int = 2048
    num_classes: int = 81313
    alpha: float = 100.0
    dtype: Any = jnp.float32

    def setup(self):
        if self.pooling_type not in ("vlad", "asmk"):
            raise ValueError(f"Unsupported pooling type: {self.pooling_type}")
        self.backbone = ResNet(
            name_=self.backbone_name,
            out_stages=(5,),
            dtype=self.dtype,
        )
        self.local_proj = nn.Conv(self.local_dim, (1, 1), name="local_proj")
        self.centroids = self.param(
            "centroids",
            nn.initializers.uniform(1.0),
            (self.num_clusters, self.local_dim),
        )
        if self.pooling_type == "asmk":
            self.weights = self.param(
                "weights", nn.initializers.ones, (self.num_clusters,)
            )
        self.final_proj = nn.Dense(self.outputdim, name="final_proj")
        self.classifier = nn.Dense(self.num_classes, name="classifier")

    def _locals(self, x, train: bool, valid_hw=None):
        fmap = self.backbone(x, train=train, valid_hw=valid_hw)
        loc = self.local_proj(fmap)
        B, H, W, D = loc.shape
        tmask = None
        if valid_hw is not None:
            ext = stage_extents(valid_hw, 5)
            tmask = make_token_mask(H, W, ext)
        return l2_normalize(loc.reshape(B, H * W, D), axis=-1), tmask

    def _features(self, x, train: bool, valid_hw=None):
        loc, tmask = self._locals(x, train, valid_hw=valid_hw)
        if self.pooling_type == "vlad":
            pooled = vlad_aggregate(loc, self.centroids, self.alpha,
                                    mask=tmask)
        else:
            pooled = asmk_aggregate(loc, self.centroids, self.weights,
                                    mask=tmask)
        return self.final_proj(pooled)

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
    "how_vlad_r50",
    description="HOW with soft-assignment VLAD aggregation (reference models/how_vlad.py:14)",
    defaults=dict(backbone_name="resnet50", pooling_type="vlad"),
    family="how",
    paper="Tolias et al., HOW (ECCV 2020)",
    table1_names=("R50-HOW-VLAD",),
)(HOWModel)

register_model(
    "how_asmk_r50",
    description="HOW with selective match-kernel (ASMK) aggregation",
    defaults=dict(backbone_name="resnet50", pooling_type="asmk"),
    family="how_asmk",
    table1_names=("R50-HOW-ASMK",),
)(HOWModel)
