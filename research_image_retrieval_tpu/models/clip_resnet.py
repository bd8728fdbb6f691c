"""CLIP ModifiedResNet visual tower (attention-pooled) in Flax / NHWC.

Behavioral contract of the reference's vendored CLIP ResNet
(reference: networks/model.py:10-154):

* 3-conv stem (3x3/2 + 3x3 + 3x3, BN+ReLU each) followed by 2x2 avg-pool
  instead of torchvision's 7x7 conv + maxpool.
* anti-aliased striding: every strided bottleneck applies stride-1 convs
  and an AvgPool2d(stride) after conv2 (and in front of the downsample
  1x1 conv).
* final pooling is a single-query QKV attention: the mean token attends
  over all HW tokens (+ learned positional embedding), projected to the
  CLIP embedding dim (reference: networks/model.py:58-91).

TPU notes: NHWC throughout; the attention pool is two MXU matmuls over
the HW token axis; position embeddings are bilinearly resized at trace
time for non-native resolutions (static per bucket), mirroring the ViT
tower's behavior.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["ModifiedResNet", "AttentionPool2d", "CLIP_RESNET_CONFIGS"]

# layers, width per OpenAI config; embed dim of the tower output is the
# checkpoint's output_dim (set via output_dim arg)
CLIP_RESNET_CONFIGS = {
    "r50": dict(layers=(3, 4, 6, 3), width=64),
    "r101": dict(layers=(3, 4, 23, 3), width=64),
    # tiny config for tests
    "rtest": dict(layers=(1, 1, 1, 1), width=8),
}


class CLIPBottleneck(nn.Module):
    """Anti-aliased bottleneck (reference: networks/model.py:10-55)."""

    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        out_ch = self.planes * 4
        y = nn.relu(norm("bn1")(nn.Conv(
            self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(x)))
        y = nn.relu(norm("bn2")(nn.Conv(
            self.planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="conv2",
        )(y)))
        if self.stride > 1:
            y = nn.avg_pool(y, (self.stride,) * 2, strides=(self.stride,) * 2)
        y = norm("bn3")(nn.Conv(
            out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(y))

        identity = x
        if self.stride > 1 or x.shape[-1] != out_ch:
            if self.stride > 1:
                identity = nn.avg_pool(
                    identity, (self.stride,) * 2, strides=(self.stride,) * 2
                )
            identity = norm("downsample_bn")(nn.Conv(
                out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                name="downsample_conv",
            )(identity))
        return nn.relu(y + identity)


class AttentionPool2d(nn.Module):
    """Single-query attention pool (reference: networks/model.py:58-91).

    The mean of the HW tokens (prepended as token 0) is the only query;
    separate q/k/v projections, multi-head, then an output projection to
    ``output_dim``.
    """

    embed_dim: int
    num_heads: int
    output_dim: int
    spacial_dim: int  # native grid side (input_resolution // 32)

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        tokens = x.reshape(B, H * W, C)
        mean = jnp.mean(tokens, axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, tokens], axis=1)  # [B, HW+1, C]

        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(self.embed_dim**-0.5),
            (self.spacial_dim**2 + 1, self.embed_dim),
        )
        if (H, W) != (self.spacial_dim, self.spacial_dim):
            grid = pos[1:].reshape(
                1, self.spacial_dim, self.spacial_dim, self.embed_dim
            )
            grid = jax.image.resize(
                grid, (1, H, W, self.embed_dim), "bilinear"
            ).reshape(H * W, self.embed_dim)
            pos = jnp.concatenate([pos[:1], grid], axis=0)
        tokens = tokens + pos[None]

        h = self.num_heads
        hd = self.embed_dim // h
        q = nn.Dense(self.embed_dim, name="q_proj")(tokens[:, :1])
        k = nn.Dense(self.embed_dim, name="k_proj")(tokens)
        v = nn.Dense(self.embed_dim, name="v_proj")(tokens)
        qh = q.reshape(B, 1, h, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(B, -1, h, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(B, -1, h, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", attn, vh, preferred_element_type=jnp.float32
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, self.embed_dim)
        return nn.Dense(self.output_dim, name="c_proj")(out)


class ModifiedResNet(nn.Module):
    """CLIP's anti-aliased ResNet with attention pooling
    (reference: networks/model.py:94-154)."""

    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    output_dim: int = 1024
    heads: int | None = None  # default: width * 32 // 64
    input_resolution: int = 224
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        half = self.width // 2
        y = nn.relu(norm("bn1")(nn.Conv(
            half, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)))
        y = nn.relu(norm("bn2")(nn.Conv(
            half, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="conv2",
        )(y)))
        y = nn.relu(norm("bn3")(nn.Conv(
            self.width, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="conv3",
        )(y)))
        y = nn.avg_pool(y, (2, 2), strides=(2, 2))

        for i, depth in enumerate(self.layers):
            planes = self.width * (2**i)
            for j in range(depth):
                y = CLIPBottleneck(
                    planes=planes,
                    stride=(2 if (j == 0 and i > 0) else 1),
                    dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                )(y, train=train)

        embed_dim = self.width * 32
        heads = self.heads if self.heads is not None else embed_dim // 64
        return AttentionPool2d(
            embed_dim=embed_dim,
            num_heads=heads,
            output_dim=self.output_dim,
            spacial_dim=self.input_resolution // 32,
            name="attnpool",
        )(y)
