"""SpCa: spatial-context aggregation (the reference repo's main method).

Behavioral contract of the reference (networks/spca.py:18-358):

* ``SpcaLayer`` — a learnable GMM-style codebook (K x local_dim with pi and
  per-cluster variance): soft-assignment attention over HW tokens from
  log(pi/sqrt(cov)) - ||x - LN(template)||^2 / (2 cov); HW-normalized
  attention builds spatial-context features OutP by contracting with
  distance-encoding matrix powers, LayerNorm'd per channel.
  NOTE: the reference also computes EM-style updates of templates/pi/cov
  scaled by gamma^(iter^0.6) (spca.py:139-151) — those results are never
  used by the output or loss (the layer returns only OutP and attn), so
  they are pure dead compute; this implementation keeps the live path
  only, producing identical outputs and gradients.
* Distance encoding (spca.py:182-202): pairwise coordinate distances ->
  exp(-sqrt(d)) -> column-normalized transition matrix A; masks are
  A^2 .. A^(multi+1).  The reference materializes a per-sample [B, HW, HW]
  copy; here one [HW, HW] matrix is shared across the batch (identical
  math, B-fold less memory).
* Five pluggable fusers (spca.py:228-358): cross-attention ('cro'),
  concat-MLP ('cat'), Hadamard outer product ('had'), orthogonal fusion
  ('orth'), decoder block ('dec'); then GeM -> whiten -> ArcFace
  ('orth' whitens the pooled vector directly).
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from research_image_retrieval_tpu.models.backbone import ResNet, stage_extents
from research_image_retrieval_tpu.models.layers import Attention, Mlp
from research_image_retrieval_tpu.models.registry import register_model
from research_image_retrieval_tpu.ops import (
    arcface_logits,
    avg_pool_all,
    cross_entropy,
    gem_pool,
    l2_normalize,
    token_mask as make_token_mask,
)

__all__ = ["SpCaModel", "SpcaLayer", "distance_encoding_masks"]


@functools.lru_cache(maxsize=32)
def _coord_distance(H: int, W: int):
    """Pairwise squared coordinate distances, cached per resolution."""
    import numpy as np

    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    coord = np.stack([yy.ravel(), xx.ravel()], axis=1).astype(np.float32)
    inner = -2.0 * coord @ coord.T
    sq = np.sum(coord * coord, axis=1, keepdims=True)
    return sq + inner + sq.T  # [HW, HW]


def distance_encoding_masks(H: int, W: int, multi: int):
    """Row-normalized distance-transition powers A^2 .. A^(multi+1).

    Matches reference distance_encoding_m (spca.py:192-202); one [HW, HW]
    matrix shared by the whole batch.
    """
    d2 = jnp.asarray(_coord_distance(H, W))
    mask = jnp.exp(-jnp.sqrt(jnp.abs(d2)))
    # reference normalizes by COLUMN sums (spca.py:195: sum over dim=1 of
    # [B, HW, HW], broadcast down the rows); the matrix is symmetric so
    # row-normalizing would silently produce the transpose
    A = mask / jnp.sum(mask, axis=0, keepdims=True)
    out = []
    M = jnp.matmul(A, A, preferred_element_type=jnp.float32)
    out.append(M)
    for _ in range(multi - 1):
        M = jnp.matmul(M, A, preferred_element_type=jnp.float32)
        out.append(M)
    return out


def masked_distance_encoding_masks(H: int, W: int, multi: int, tmask):
    """Per-image distance-transition powers restricted to valid tokens.

    For bucketed variable-resolution extraction: pad rows AND columns of
    the exp(-sqrt(d)) affinity are zeroed per image before the column
    normalization and the matrix powers, so the valid sub-block equals the
    exact-shape ``distance_encoding_masks`` of that image's true grid
    (coordinates of valid tokens are identical because padding is
    bottom/right).

    Args:
      tmask: [B, H*W] validity mask over row-major tokens.

    Returns:
      list of ``multi`` [B, HW, HW] matrices (A^2 .. A^(multi+1)).
    """
    d2 = jnp.asarray(_coord_distance(H, W))
    e = jnp.exp(-jnp.sqrt(jnp.abs(d2)))  # [N, N]
    tm = tmask.astype(jnp.float32)
    e_b = e[None] * tm[:, :, None] * tm[:, None, :]  # [B, N, N]
    col = jnp.sum(e_b, axis=1, keepdims=True)  # [B, 1, N] valid-row sums
    A = jnp.where(col > 0.0, e_b / jnp.maximum(col, 1e-30), 0.0)
    out = []
    M = jnp.matmul(A, A, preferred_element_type=jnp.float32)
    out.append(M)
    for _ in range(multi - 1):
        M = jnp.matmul(M, A, preferred_element_type=jnp.float32)
        out.append(M)
    return out


class SpcaLayer(nn.Module):
    """GMM soft-assignment + spatial-context features
    (reference: networks/spca.py:97-180)."""

    K: int = 16
    local_dim: int = 128
    multi: int = 1

    @nn.compact
    def __call__(self, g_fea, tmask=None):
        B, H, W, _ = g_fea.shape
        x = nn.Conv(self.local_dim, (1, 1), use_bias=False, name="proj_kv")(g_fea)
        x = x.reshape(B, H * W, self.local_dim)

        clusters = self.param(
            "clusters", nn.initializers.xavier_uniform(),
            (1, self.K, self.local_dim),
        )
        pi = self.param(
            "pi", lambda _: jnp.full((1, self.K), 1.0 / self.K, jnp.float32)
        )
        cov = self.param("cov", nn.initializers.ones, (1, self.K))

        # torch LayerNorm epsilon (1e-5): the distance-encoded features have
        # tiny variance, so the eps choice is visible in the output scale
        templates = nn.LayerNorm(epsilon=1e-5, name="norm_templates")(clusters)
        # ||x - t||^2 over feature dim: [B, HW, K]
        sq = (
            jnp.sum(x**2, -1, keepdims=True)
            - 2.0 * jnp.einsum("bnd,okd->bnk", x, templates,
                               preferred_element_type=jnp.float32)
            + jnp.sum(templates**2, -1)
        )
        attn_logits = jnp.log(pi / jnp.sqrt(cov))[:, None, :] - sq / cov[:, None, :] / 2.0
        attn = jax.nn.softmax(attn_logits, axis=-1)  # [B, HW, K]

        attn_ = attn + 1e-8
        if tmask is not None:
            # drop padded tokens from the HW normalization and the
            # distance-encoding contraction below
            attn_ = attn_ * tmask[:, :, None]
        attn_ = attn_ / jnp.sum(attn_, axis=-2, keepdims=True)  # L1 over HW

        if tmask is None:
            masks = distance_encoding_masks(H, W, self.multi)
            parts = [
                jnp.einsum("bnk,nm->bkm", attn_, m,
                           preferred_element_type=jnp.float32)
                for m in masks
            ]
        else:
            masks = masked_distance_encoding_masks(H, W, self.multi, tmask)
            parts = [
                jnp.einsum("bnk,bnm->bkm", attn_, m,
                           preferred_element_type=jnp.float32)
                for m in masks
            ]
        outp = jnp.concatenate(parts, axis=1)  # [B, K*multi, HW]
        outp = nn.LayerNorm(epsilon=1e-5, name="p_norm")(
            outp.transpose(0, 2, 1)
        )  # over channels
        outp = outp.reshape(B, H, W, self.K * self.multi)
        attn_map = attn.reshape(B, H, W, self.K)
        return outp, attn_map


class CrossAttnFuser(nn.Module):
    """'cro' fuser (reference: spca.py:259-286)."""

    dim: int
    inputdim: int

    @nn.compact
    def __call__(self, q_map, x_map, deterministic: bool = True, tmask=None):
        B, H, W, C = q_map.shape
        q = q_map.reshape(B, H * W, C)
        x = x_map.reshape(B, H * W, x_map.shape[-1])
        q_ln = nn.LayerNorm(epsilon=1e-5, name="ln")(q)
        x = nn.Dense(self.dim, name="proj")(x)
        q = q + Attention(self.dim, 8, qkv_bias=True, name="cross_attn")(
            q_ln, x, x, deterministic, key_mask=tmask
        )
        q = q + Mlp(2 * self.dim, self.dim, name="mlp")(q, deterministic)
        return q.reshape(B, H, W, C)


class ConcatFuser(nn.Module):
    """'cat' fuser (reference: spca.py:288-308) — output has 2*dim channels."""

    dim: int
    inputdim: int

    @nn.compact
    def __call__(self, q_map, x_map, deterministic: bool = True, tmask=None):
        B, H, W, C = q_map.shape
        q = nn.LayerNorm(epsilon=1e-5, name="bn1")(q_map.reshape(B, H * W, C))
        x = nn.Dense(self.dim, name="proj")(
            x_map.reshape(B, H * W, x_map.shape[-1])
        )
        x = nn.LayerNorm(epsilon=1e-5, name="bn2")(x)
        qx = jnp.concatenate([q, x], axis=2)
        qx = qx + Mlp(4 * self.dim, 2 * self.dim, name="mlp")(qx, deterministic)
        return qx.reshape(B, H, W, 2 * C)  # per-token ops: no mask needed


class HadamardFuser(nn.Module):
    """'had' fuser (reference: spca.py:310-330) — outer-product channels."""

    dim: int
    inputdim: int

    @nn.compact
    def __call__(self, q_map, x_map, deterministic: bool = True, tmask=None):
        B, H, W, C = q_map.shape
        q = nn.Dense(self.dim // 4, name="proj")(q_map.reshape(B, H * W, C))
        q = nn.LayerNorm(epsilon=1e-5, name="bn1")(q)
        x = nn.LayerNorm(epsilon=1e-5, name="bn2")(
            x_map.reshape(B, H * W, x_map.shape[-1])
        )
        out = jnp.einsum("bnc,bnd->bncd", q, x,
                         preferred_element_type=jnp.float32)
        out = out.reshape(B, H * W, -1)
        return out.reshape(B, H, W, out.shape[-1])  # per-token: no mask needed


class OrthogonalFuser(nn.Module):
    """'orth' fuser (reference: spca.py:332-358) — returns a pooled VECTOR."""

    dim: int
    inputdim: int

    @nn.compact
    def __call__(self, g_map, l_map, deterministic: bool = True, tmask=None):
        half = self.dim // 2
        mask = (
            None if tmask is None
            else tmask.reshape(g_map.shape[0], g_map.shape[1], g_map.shape[2])
        )
        fg = nn.Dense(half, name="fc_t")(
            gem_pool(g_map, p=3.0, valid_hw=mask)
        )  # [B, dim/2]
        fl = nn.Conv(half, (1, 1), name="fc")(l_map)  # [B, H, W, dim/2]
        fg_sq = jnp.sum(fg * fg, axis=-1, keepdims=True)
        coef = jnp.einsum("bhwc,bc->bhw", fl, fg,
                          preferred_element_type=jnp.float32)
        proj = coef[..., None] * fg[:, None, None, :] / fg_sq[:, None, None, :]
        fo = avg_pool_all(fl - proj, valid_hw=mask)
        return jnp.concatenate([fg, fo], axis=-1)  # [B, dim]


class DecoderFuser(nn.Module):
    """'dec' fuser (reference: spca.py:229-257)."""

    dim: int
    inputdim: int

    @nn.compact
    def __call__(self, q_map, x_map, deterministic: bool = True, tmask=None):
        B, H, W, C = q_map.shape
        q = q_map.reshape(B, H * W, C)
        x = nn.Dense(self.dim, name="proj_fc")(
            x_map.reshape(B, H * W, x_map.shape[-1])
        )
        x = nn.LayerNorm(epsilon=1e-5, name="proj_ln")(x)
        cross = Attention(self.dim, 8, qkv_bias=True, name="cross_attn")
        self_a = Attention(self.dim, 8, qkv_bias=True, name="self_attn")
        mlp = Mlp(2 * self.dim, self.dim, name="mlp")
        q_bn = nn.LayerNorm(epsilon=1e-5, name="bn1")(q)
        q = q + cross(q_bn, x, x, deterministic, key_mask=tmask)
        q = q + mlp(q, deterministic)
        q_bn = nn.LayerNorm(epsilon=1e-5, name="bn2")(q)
        q = q + self_a(q_bn, q_bn, q_bn, deterministic, key_mask=tmask)
        return q.reshape(B, H, W, C)


_FUSERS = {
    "cro": CrossAttnFuser,
    "fur": CrossAttnFuser,  # reference Fuser_ shares the Fuser architecture
    "cat": ConcatFuser,
    "had": HadamardFuser,
    "orth": OrthogonalFuser,
    "dec": DecoderFuser,
}


class SpCaModel(nn.Module):
    """SpCa = backbone + SpcaLayer + fuser + GeM + whiten + ArcFace
    (reference: networks/spca.py:18-95)."""

    backbone_name: str = "resnet101"
    outputdim: int = 2048
    num_classes: int = 81313
    K: int = 16
    local_dim: int = 128
    multi: int = 1
    combine: str = "cro"
    s: float = 45.0
    m: float = 0.2
    mediumdim: int = 2048
    dtype: Any = jnp.float32

    def setup(self):
        key = self.combine[:3] if not self.combine.startswith("orth") else "orth"
        if key not in _FUSERS:
            raise ValueError(f"Unseen fusion scheme: {self.combine}")
        self.backbone = ResNet(
            name_=self.backbone_name,
            out_stages=(5,),
            dtype=self.dtype,
        )
        self.pos_branch = SpcaLayer(
            K=self.K, local_dim=self.local_dim, multi=self.multi
        )
        self.fuser = _FUSERS[key](
            dim=self.mediumdim, inputdim=self.K * self.multi, name="fuser"
        )
        self.whiten = nn.Dense(self.outputdim, name="whiten")
        self.classifier_w = self.param(
            "classifier_w",
            nn.initializers.xavier_uniform(),
            (self.num_classes, self.outputdim),
        )

    def _descriptor(self, x, train: bool, valid_hw=None):
        g_fea = self.backbone(x, train=train, valid_hw=valid_hw)
        tmask = None
        if valid_hw is not None:
            ext = stage_extents(valid_hw, 5)
            tmask = make_token_mask(g_fea.shape[1], g_fea.shape[2], ext)
        p_fea, _attn = self.pos_branch(g_fea, tmask=tmask)
        fused = self.fuser(g_fea, p_fea, deterministic=not train, tmask=tmask)
        if self.combine.startswith("orth"):
            return self.whiten(fused)  # fuser already pooled to a vector
        mask = (
            None if tmask is None
            else tmask.reshape(fused.shape[0], fused.shape[1], fused.shape[2])
        )
        return self.whiten(gem_pool(fused, p=3.0, valid_hw=mask))

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
    "spca_r101",
    description="SpCa spatial-context aggregation over ResNet101 (reference networks/spca.py:18)",
    defaults=dict(backbone_name="resnet101", outputdim=2048, K=16,
                  local_dim=128, multi=1, combine="cro"),
    family="spca",
    paper="SpCa (the reference repo's primary method)",
    table1_names=("R101-SpCa",),
)(SpCaModel)

register_model(
    "spca_r50",
    description="SpCa over ResNet50",
    defaults=dict(backbone_name="resnet50", outputdim=2048, K=16,
                  local_dim=128, multi=1, combine="cro"),
    family="spca",
)(SpCaModel)
