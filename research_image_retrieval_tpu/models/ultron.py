"""ULTRON: unifying local transformer and convolution for image retrieval.

Behavioral contract of the reference ultron_modules
(reference: models/ultron_modules/{cdconv,scala,ultron}.py):

* CDConv (cdconv.py:14-171): channel attention from a circular 1-D conv
  over channel-wise GAP (eq 1) selects a per-channel dilation rate by
  thresholds tau1/tau2; approximated as a weighted mix of three dilated
  convs with weights = fraction of channels at each rate, then BN.
  The reference's O(C*K) Python loop (cdconv.py:97-103) is re-derived as
  K rolled-GAP multiply-adds.
* SCALA (scala.py:14-213): Swin-style window partition (with padding),
  window attention with relative position bias, plus a Multi-scale Context
  Kernel (3 depthwise dilated convs + 1x1 fuse).  NOTE: the reference
  computes MCK windows but never feeds them into attention
  (scala.py:173-182 — dead compute); per the paper's eq (5) the keys
  should come from MCK(x), controlled here by ``use_context_keys``
  (default True = paper semantics; False = reference's effective
  behavior).
* ULTRON (ultron.py:17-474): PatchEmbed(4x4)+abs pos embed -> stages 0-1
  CDConv blocks, stages 2-3 SCALA blocks with PatchMerging downsampling;
  attention-based GeM global pooling (eqs 9-12); ULTRON-S/B configs.
* Training loss: MadaCos (+0.1-weighted aux CE) — see ops.losses.

TPU notes: window partition is pure static reshape/transpose; the CDConv
mix is 3 convs + elementwise blend (XLA fuses the blend); pos embed is
bilinearly resized at trace time for non-native resolutions.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from research_image_retrieval_tpu.models.registry import register_model
from research_image_retrieval_tpu.ops import l2_normalize, madacos_loss

__all__ = ["ULTRON", "ULTRONRetrievalModel", "CDConvBlock", "SCALABlock"]


class CDConv(nn.Module):
    """Channel-wise dilated conv (reference: cdconv.py:14-171)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    tau1: float = 0.75
    tau2: float = 0.50
    delta1: int = 3
    delta2: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        C = x.shape[-1]
        K = self.kernel_size

        if mask is not None:
            # padded-bucket extraction: zero the pad region so the dilated
            # convs below read exact zero padding at the true boundary
            x = x * mask[..., None].astype(x.dtype)

        # eq (1): a_c = sigmoid(sum_k w[k,c] * GAP[(c+k) % C]).
        # statistics in fp32 (the HW reduction loses precision in bf16;
        # the convert fuses into the reduce — no extra HBM traffic)
        if mask is None:
            gap = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # [B, C]
        else:
            cnt = jnp.maximum(jnp.sum(mask, axis=(1, 2)), 1.0)[:, None]
            gap = jnp.sum(
                x.astype(jnp.float32) * mask[..., None], axis=(1, 2)
            ) / cnt
        w = self.param(
            "channel_attention_weights",
            lambda key: jax.random.normal(key, (K, C)) / np.sqrt(C),
        )
        scores = sum(
            w[k][None, :] * jnp.roll(gap, shift=-k, axis=1) for k in range(K)
        )
        attn = jax.nn.sigmoid(scores)  # [B, C]

        # per-channel dilation rate -> per-batch mixing fractions
        is_d1 = (attn <= self.tau1) & (attn > self.tau2)
        is_d2 = attn <= self.tau2
        is_1 = ~(is_d1 | is_d2)
        frac = lambda m: jnp.mean(m.astype(jnp.float32), axis=1)[:, None, None, None]
        f1, fd1, fd2 = frac(is_1), frac(is_d1), frac(is_d2)
        total = f1 + fd1 + fd2 + 1e-8

        conv = lambda d, name: nn.Conv(
            self.features, (K, K), strides=(self.stride,) * 2,
            padding=[(d * (K // 2),) * 2] * 2, kernel_dilation=(d, d),
            use_bias=False, dtype=self.dtype, name=name,
        )
        mix = lambda f: (f / total).astype(self.dtype)
        out = (
            mix(f1) * conv(1, "conv_d1")(x)
            + mix(fd1) * conv(self.delta1, "conv_dd1")(x)
            + mix(fd2) * conv(self.delta2, "conv_dd2")(x)
        )
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(out)


class CDConvBlock(nn.Module):
    """Residual CDConv block (reference: cdconv.py:173-228)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        idt = x
        y = nn.relu(CDConv(self.features, stride=self.stride,
                           dtype=self.dtype,
                           name="cdconv1")(x, train, mask=mask))
        y = CDConv(self.features, dtype=self.dtype,
                   name="cdconv2")(y, train, mask=mask)
        if idt.shape[-1] != self.features or self.stride != 1:
            idt = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                          use_bias=False, dtype=self.dtype,
                          name="down_conv")(idt)
            idt = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, dtype=self.dtype,
                               name="down_bn")(idt)
        return nn.relu(y + idt)


class MultiScaleContextKernel(nn.Module):
    """3 depthwise dilated convs + 1x1 fuse (reference: scala.py:14-57)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        outs = []
        for d in (1, 2, 3):
            outs.append(
                nn.Conv(
                    self.dim, (3, 3), padding=[(d, d), (d, d)],
                    kernel_dilation=(d, d), feature_group_count=self.dim,
                    use_bias=False, dtype=self.dtype, name=f"dc{d}",
                )(x)
            )
        y = nn.Conv(self.dim, (1, 1), use_bias=False, dtype=self.dtype,
                    name="fuse")(jnp.concatenate(outs, axis=-1))
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name="bn")(y)


def window_partition(x, ws: int):
    """[B, H, W, C] -> ([B*nH*nW, ws*ws, C], padded (H, W))."""
    B, H, W, C = x.shape
    pad_h = (ws - H % ws) % ws
    pad_w = (ws - W % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)
    return x, (Hp, Wp)


def window_reverse(windows, ws: int, Hp: int, Wp: int, H: int, W: int):
    """Inverse of window_partition, cropping any padding."""
    C = windows.shape[-1]
    B = windows.shape[0] // ((Hp // ws) * (Wp // ws))
    x = windows.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return x[:, :H, :W, :]


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # [ws*ws, ws*ws]


class SCALAAttention(nn.Module):
    """Windowed local attention with MCK context keys
    (reference: scala.py:59-213)."""

    dim: int
    window_size: int = 7
    num_heads: int = 8
    qkv_bias: bool = True
    use_context_keys: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        B, H, W, C = x.shape
        ws = self.window_size
        h = self.num_heads
        hd = C // h

        if mask is not None:
            # the exact-shape run zero-pads BOTH the tokens and the MCK
            # context inside window_partition; zeroing the bucket pad
            # region reproduces those windows bit-for-bit
            x = x * mask[..., None].astype(x.dtype)
        context = MultiScaleContextKernel(self.dim, dtype=self.dtype,
                                          name="mck")(x, train, mask=mask)
        if mask is not None:
            context = context * mask[..., None].astype(context.dtype)
        xw, (Hp, Wp) = window_partition(x, ws)  # [nB, N, C]
        cw, _ = window_partition(context, ws)
        N = ws * ws

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(xw)
        qkv = qkv.reshape(-1, N, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # [nB, h, N, hd]
        if self.use_context_keys:
            # paper eq (5): keys carry multi-scale context
            k = (
                nn.Dense(C, use_bias=self.qkv_bias, dtype=self.dtype,
                         name="context_k")(cw)
                .reshape(-1, N, h, hd)
                .transpose(0, 2, 1, 3)
            )

        # scores accumulate in fp32 (MXU-native for bf16 q/k); softmax
        # stays fp32, then the probabilities drop back to the compute
        # dtype for the value contraction
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q * (hd**-0.5), k,
            preferred_element_type=jnp.float32,
        )
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), h),
        )
        idx = jnp.asarray(_relative_position_index(ws).reshape(-1))
        rel_bias = bias_table[idx].reshape(N, N, h).transpose(2, 0, 1)
        attn = jax.nn.softmax(attn + rel_bias[None], axis=-1)

        out = jnp.einsum(
            "bhnm,bhmd->bhnd", attn.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
        out = out.transpose(0, 2, 1, 3).reshape(-1, N, C)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)
        return window_reverse(out, ws, Hp, Wp, H, W)


class SCALABlock(nn.Module):
    """BN + SCALA attention + conv-MLP residuals (reference: scala.py:215-270)."""

    dim: int
    window_size: int = 7
    num_heads: int = 8
    mlp_ratio: float = 4.0
    use_context_keys: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        x = x + SCALAAttention(
            self.dim, self.window_size, self.num_heads,
            use_context_keys=self.use_context_keys, dtype=self.dtype,
            name="attn",
        )(bn("norm1")(x), train, mask=mask)
        hidden = int(self.dim * self.mlp_ratio)
        y = bn("norm2")(x)
        y = nn.Conv(hidden, (1, 1), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    """2x2 patch merge + LN + linear reduce (reference: ultron.py:59-94).

    The reference always reduces to 2*C, which makes its ULTRON-S config
    (embed_dims 64,128,320,512 — not exact doublings) crash at stage 2;
    here the output dim is explicit so non-doubling stage widths work.
    """

    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class AttentionBasedGlobalPooling(nn.Module):
    """GeM-query attention pooling, eqs 9-12 (reference: ultron.py:174-244)."""

    dim: int
    gamma: float = 2.0
    alpha: float = 2.0

    @nn.compact
    def __call__(self, x, mask=None):
        B, H, W, C = x.shape
        g = self.param("gamma", lambda _: jnp.asarray(self.gamma, jnp.float32))
        g = jnp.clip(g, 1e-7, 100.0)
        xg = jnp.clip(x, min=1e-7) ** g
        if mask is None:
            dq = jnp.mean(xg, axis=(1, 2)) ** (1.0 / g)
        else:
            cnt = jnp.maximum(jnp.sum(mask, axis=(1, 2)), 1.0)[:, None]
            dq = (
                jnp.sum(xg * mask[..., None], axis=(1, 2)) / cnt
            ) ** (1.0 / g)
        dq = nn.Dense(self.dim, name="query_proj")(dq)  # [B, C]

        tokens = x.reshape(B, H * W, C)
        scores = jnp.einsum(
            "bnc,bc->bn", tokens, dq, preferred_element_type=jnp.float32
        ) / np.sqrt(self.dim)
        if mask is not None:
            scores = jnp.where(
                mask.reshape(B, H * W) > 0, scores, jnp.float32(-1e30)
            )
        A = jax.nn.softmax(scores, axis=-1)
        weighted = jnp.einsum(
            "bn,bnc->bc", A, tokens, preferred_element_type=jnp.float32
        )
        out = weighted**self.alpha if self.alpha != 1.0 else jnp.exp(weighted)
        return l2_normalize(out, axis=-1)


class ULTRON(nn.Module):
    """4-stage hybrid backbone (reference: ultron.py:246-474)."""

    embed_dims: Sequence[int] = (64, 128, 320, 512)
    depths: Sequence[int] = (3, 5, 9, 5)
    num_heads: Sequence[int] = (2, 4, 10, 16)
    patch_size: int = 4
    window_size: int = 7
    mlp_ratio: float = 4.0
    img_size: int = 224
    gem_gamma: float = 2.0
    gem_alpha: float = 2.0
    use_context_keys: bool = True
    dtype: Any = jnp.float32
    # run only the first k stages (None = all 4) — truncation hook for
    # per-stage roofline decomposition (tools/roofline_ultron.py)
    num_stages: int | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, valid_hw=None):
        """``valid_hw``: optional [B, 2] TRUE input extents for bucketed
        extraction.  CONTRACT: extents (and the padded canvas) must be
        multiples of 32 — the same constraint the exact-shape model
        imposes (PatchMerging needs even dims at every stage)."""
        B, H, W, _ = x.shape
        x = x.astype(self.dtype)
        y = nn.Conv(
            self.embed_dims[0], (self.patch_size,) * 2,
            strides=(self.patch_size,) * 2, dtype=self.dtype,
            name="patch_embed",
        )(x)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(y)

        pr = self.img_size // self.patch_size
        pos = self.param(
            "absolute_pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, pr, pr, self.embed_dims[0]),
        )
        if valid_hw is None:
            if y.shape[1:3] != (pr, pr):
                pos = jax.image.resize(
                    pos, (1, y.shape[1], y.shape[2], self.embed_dims[0]),
                    "bilinear",
                )
            y = y + pos.astype(y.dtype)
            ext = None
        else:
            # per-image pos-embed interpolation to the TRUE grid, placed
            # inside the padded canvas (the exact-shape run resizes to
            # its own grid; rows/cols beyond the true grid get zero)
            ext = jnp.asarray(valid_hw, jnp.int32) // self.patch_size
            from research_image_retrieval_tpu.ops.masking import (
                dynamic_resize_weights,
            )

            wh = dynamic_resize_weights(y.shape[1], pr, ext[:, 0])
            ww = dynamic_resize_weights(y.shape[2], pr, ext[:, 1])
            pos_b = jnp.einsum("bhp,pqc,bwq->bhwc", wh, pos[0], ww,
                               preferred_element_type=jnp.float32)
            y = y + pos_b.astype(y.dtype)

        from research_image_retrieval_tpu.ops.masking import hw_mask

        for i, (dim, depth, heads) in enumerate(
            zip(self.embed_dims, self.depths, self.num_heads)
        ):
            if self.num_stages is not None and i >= self.num_stages:
                break
            if i > 0:
                y = PatchMerging(out_dim=dim, dtype=self.dtype,
                                 name=f"merge{i}")(y)
                if ext is not None:
                    # the 32-multiple contract keeps every stage extent
                    # even, so merging exactly halves it
                    ext = ext // 2
            mask = (
                None if ext is None
                else hw_mask(y.shape[1], y.shape[2], ext)
            )
            for j in range(depth):
                if i < 2:
                    y = CDConvBlock(dim, dtype=self.dtype,
                                    name=f"stage{i}_block{j}")(
                        y, train, mask=mask
                    )
                else:
                    y = SCALABlock(
                        dim, self.window_size, heads, self.mlp_ratio,
                        use_context_keys=self.use_context_keys,
                        dtype=self.dtype,
                        name=f"stage{i}_block{j}",
                    )(y, train, mask=mask)
        return y


class ULTRONRetrievalModel(nn.Module):
    """ULTRON + MadaCos training loss (dual train/extract API).

    Matches the reference's training setup (ultron_training.py:219-223
    with models/ultron_modules/madacos_loss.py): descriptor = attention
    GeM pooling of the final stage; loss = MadaCos over a learnable class
    weight matrix.
    """

    num_classes: int = 81313
    variant: str = "s"  # "s" or "b"
    img_size: int = 224
    window_size: int = 7
    rho: float = 0.04
    use_context_keys: bool = True
    dtype: Any = jnp.float32  # backbone compute dtype (bf16 for TPU
    # training; descriptor pooling, L2, and MadaCos always run fp32)

    @property
    def extent_multiple(self) -> int:
        """Grid alignment contract for bucketed masked extraction: true
        extents must be multiples of 32 (4-patch embed x 3 PatchMerging
        halvings; extract_vectors snaps them — see index/extract.py)."""
        return 32

    def setup(self):
        cfg = {
            "s": dict(embed_dims=(64, 128, 320, 512), depths=(3, 5, 9, 5),
                      num_heads=(2, 4, 10, 16)),
            "b": dict(embed_dims=(96, 192, 384, 768), depths=(5, 7, 18, 5),
                      num_heads=(3, 6, 12, 24)),
            # tiny config for tests / dry runs
            "t": dict(embed_dims=(16, 32, 48, 64), depths=(1, 1, 1, 1),
                      num_heads=(2, 2, 2, 4)),
        }[self.variant]
        self.backbone = ULTRON(
            img_size=self.img_size, window_size=self.window_size,
            use_context_keys=self.use_context_keys, dtype=self.dtype, **cfg,
        )
        self.embed_dim = cfg["embed_dims"][-1]
        self.pooling = AttentionBasedGlobalPooling(
            self.embed_dim, name="global_pool"
        )
        self.classifier_w = self.param(
            "classifier_w",
            nn.initializers.xavier_uniform(),
            (self.num_classes, self.embed_dim),
        )

    def _descriptor(self, x, train: bool, valid_hw=None):
        fmap = self.backbone(x, train=train, valid_hw=valid_hw)
        fmap = fmap.astype(jnp.float32)  # pooling/L2/loss stay fp32
        mask = None
        if valid_hw is not None:
            from research_image_retrieval_tpu.ops.masking import hw_mask

            ext = jnp.asarray(valid_hw, jnp.int32) // 32  # stage-4 stride
            mask = hw_mask(fmap.shape[1], fmap.shape[2], ext)
        return self.pooling(fmap, mask=mask)

    def __call__(self, x, labels, train: bool = True):
        feat = self._descriptor(x, train)
        # the adaptive margin is a training construct; eval logits use
        # m=0 (scale does not affect argmax) so accuracy is unpenalized
        loss, aux = madacos_loss(feat, self.classifier_w, labels, rho=self.rho,
                                 fixed_margin=None if train else 0.0)
        return loss, aux["logits"]

    def extract(self, x, valid_hw=None):
        """L2-normalized descriptor.

        ``valid_hw``: [B, 2] TRUE input extents for bucketed extraction.
        CONTRACT: every extent (and the padded canvas) must be a multiple
        of 32 — the exact-shape model imposes the same constraint
        (PatchMerging needs even dims at every stage), so thumbnail to
        32-multiples before bucketing.
        """
        return l2_normalize(
            self._descriptor(x, train=False, valid_hw=valid_hw)
        )


register_model(
    "ultron_s",
    description="ULTRON-S hybrid CDConv+SCALA with MadaCos (reference models/ultron_modules/ultron.py:246)",
    defaults=dict(variant="s"),
    family="ultron",
    paper="ULTRON: Unifying Local Transformer and Convolution",
    table1_names=("ULTRON-S",),
)(ULTRONRetrievalModel)

register_model(
    "ultron_b",
    description="ULTRON-B (larger config)",
    defaults=dict(variant="b"),
    family="ultron",
    table1_names=("ULTRON-B",),
)(ULTRONRetrievalModel)
