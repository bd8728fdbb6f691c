"""Shared transformer building blocks for the model zoo.

Functional re-derivations of the reference's local attention stack
(reference: networks/RetrievalNet.py:39-161), used by the Token model and
the SpCa fusers:

* ``Attention`` — separate q/k/v projections; the output projection is
  zero-initialized so each residual branch starts as identity.
* ``Encoder`` — pre-residual self-attention, then BatchNorm over flattened
  tokens + a single Linear as the MLP (RetrievalNet.py:129-142).
* ``Decoder`` — LN -> cross-attention -> MLP -> LN -> self-attention,
  all residual (RetrievalNet.py:145-161).
* ``DropPath`` — stochastic depth on the residual branches.

All ops are batch-first [B, N, D]; attention matmuls run fp32 on the MXU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["Attention", "Encoder", "Decoder", "Mlp", "DropPath"]


class DropPath(nn.Module):
    """Stochastic depth: drop the whole residual branch per sample."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
        return x / keep * mask


class Mlp(nn.Module):
    """Linear -> GELU -> dropout -> Linear -> dropout
    (reference: RetrievalNet.py:75-91)."""

    hidden: int
    out: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out, name="fc2")(x)
        return nn.Dropout(self.drop)(x, deterministic=deterministic)


class Attention(nn.Module):
    """Multi-head attention with separate q/k/v inputs.

    Matches the reference block (RetrievalNet.py:94-126): scale =
    head_dim^-0.5, softmax over keys, zero-initialized output projection.
    """

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, q, k, v, deterministic: bool = True, key_mask=None):
        B, Nq, _ = q.shape
        Nk = k.shape[1]
        h = self.num_heads
        hd = self.dim // h
        scale = hd**-0.5

        dense = lambda name: nn.Dense(self.dim, use_bias=self.qkv_bias, name=name)
        qh = dense("q")(q).reshape(B, Nq, h, hd).transpose(0, 2, 1, 3)
        kh = dense("k")(k).reshape(B, Nk, h, hd).transpose(0, 2, 1, 3)
        vh = dense("v")(v).reshape(B, Nk, h, hd).transpose(0, 2, 1, 3)

        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
        ) * scale
        if key_mask is not None:
            # padded-bucket extraction: [B, Nk] mask removes pad tokens
            # from every query's softmax (ops.masking.mask_attn_logits)
            from research_image_retrieval_tpu.ops.masking import mask_attn_logits

            attn = mask_attn_logits(attn, key_mask)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", attn, vh, preferred_element_type=jnp.float32
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, Nq, self.dim)
        out = nn.Dense(
            self.dim,
            use_bias=self.qkv_bias,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj",
        )(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class Encoder(nn.Module):
    """Self-attention encoder block with token BatchNorm
    (reference: RetrievalNet.py:129-142)."""

    dim: int
    num_heads: int
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(
        self, x, deterministic: bool = True, train: bool = False, key_mask=None
    ):
        dp = DropPath(self.drop_path)
        attn = Attention(
            self.dim, self.num_heads, self.qkv_bias, self.attn_drop, self.drop,
            name="attn",
        )
        x = x + dp(attn(x, x, x, deterministic, key_mask=key_mask), deterministic)
        # BatchNorm1d over flattened (B*N, D) tokens == BN over (B, N) axes
        x_bn = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
        )(x)
        x = x + dp(nn.Dense(self.dim, name="mlp")(x_bn), deterministic)
        return x


class Decoder(nn.Module):
    """Cross+self attention decoder block (reference: RetrievalNet.py:145-161)."""

    dim: int
    num_heads: int
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, q, x, deterministic: bool = True, key_mask=None):
        dp = DropPath(self.drop_path)
        cross = Attention(
            self.dim, self.num_heads, self.qkv_bias, self.attn_drop, self.drop,
            name="cross_attn",
        )
        self_attn = Attention(
            self.dim, self.num_heads, self.qkv_bias, self.attn_drop, self.drop,
            name="self_attn",
        )
        mlp = Mlp(2 * self.dim, self.dim, self.drop, name="mlp")

        q_bn = nn.LayerNorm(epsilon=1e-5, name="bn1")(q)
        q = q + dp(cross(q_bn, x, x, deterministic, key_mask=key_mask),
                   deterministic)
        q = q + dp(mlp(q, deterministic), deterministic)
        q_bn = nn.LayerNorm(epsilon=1e-5, name="bn2")(q)
        q = q + dp(self_attn(q_bn, q_bn, q_bn, deterministic), deterministic)
        return q
