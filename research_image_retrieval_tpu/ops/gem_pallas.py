"""Fused GeM pooling + whitening projection + L2 norm as one Pallas kernel.

The descriptor head of the GeM family (reference: RetrievalNet.py:327-354)
is clamp^p -> spatial mean -> ^(1/p) -> 1x1 whiten -> L2 normalize.  This
kernel fuses the whole chain: feature-map blocks stream HBM -> VMEM once,
the pooled vector, whiten matmul (MXU) and normalization all happen
on-chip, and only the final [B, D] descriptor is written back — no
intermediate pooled/projected tensors ever hit HBM.

Supports the bucket-validity mask used by variable-resolution extraction
(mask-aware mean, see ops.pooling).  Grid = (batch, HW blocks); TPU grid
steps run sequentially per core so the accumulator scratch carries across
the HW blocks of one image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_gem_whiten_l2", "gem_whiten_l2_reference"]


def gem_whiten_l2_reference(fmap, weight, bias, p=3.0, eps=1e-6, valid_hw=None):
    """Unfused reference composition (for parity tests and non-TPU)."""
    from research_image_retrieval_tpu.ops.norm import l2_normalize
    from research_image_retrieval_tpu.ops.pooling import gem_pool

    pooled = gem_pool(fmap, p=p, eps=eps, valid_hw=valid_hw)
    y = jnp.matmul(pooled, weight, preferred_element_type=jnp.float32) + bias
    return l2_normalize(y, axis=-1)


def _kernel(x_ref, m_ref, w_ref, b_ref, out_ref, acc, cnt, *, p, eps, blk, hw):
    i = pl.program_id(1)
    nblk = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        cnt[:] = jnp.zeros_like(cnt)

    x = x_ref[0].astype(jnp.float32)  # [BLK, C]
    mask = m_ref[0].astype(jnp.float32)  # [BLK]
    # zero out padded rows past HW (when HW % blk != 0)
    row = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)[:, 0]
    in_range = (row + i * blk) < hw
    mask = jnp.where(in_range, mask, 0.0)

    powed = jnp.clip(x, min=eps) ** p
    acc[:] += jnp.sum(powed * mask[:, None], axis=0, keepdims=True)
    cnt[0, 0] += jnp.sum(mask)

    @pl.when(i == nblk - 1)
    def _finalize():
        mean = acc[:] / jnp.maximum(cnt[0, 0], 1.0)
        pooled = mean ** (1.0 / p)  # [1, C]
        y = (
            jnp.dot(pooled, w_ref[:], preferred_element_type=jnp.float32)
            + b_ref[:]
        )  # [1, D]
        norm = jnp.sqrt(jnp.sum(y * y))
        out_ref[:] = y / jnp.maximum(norm, 1e-12)


def pallas_gem_whiten_l2(
    fmap: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    p: float = 3.0,
    eps: float = 1e-6,
    valid_hw: jnp.ndarray | None = None,
    block: int = 256,
):
    """Fused descriptor head.

    Args:
      fmap: [B, H, W, C] feature map.
      weight: [C, D] whiten projection.  bias: [D].
      valid_hw: optional [B, H, W] bucket mask.
      block: HW rows per grid step (VMEM: block*C*4 bytes).

    Returns:
      [B, D] L2-normalized descriptors (fp32).
    """
    B, H, W, C = fmap.shape
    D = weight.shape[1]
    hw = H * W
    x = fmap.reshape(B, hw, C)
    mask = (
        valid_hw.reshape(B, hw).astype(jnp.float32)
        if valid_hw is not None
        else jnp.ones((B, hw), jnp.float32)
    )
    pad = (-hw) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    nblk = x.shape[1] // block

    kernel = functools.partial(_kernel, p=p, eps=eps, blk=block, hw=hw)
    return pl.pallas_call(
        kernel,
        grid=(B, nblk),
        in_specs=[
            pl.BlockSpec((1, block, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda b, i: (b, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, D), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, D), lambda b, i: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, C), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=B * (hw * C * 3 + 2 * C * D),
            bytes_accessed=(B * hw * C + C * D + B * D) * 4,
            transcendentals=B * C * 2,
        ),
    )(x, mask, weight.astype(jnp.float32), bias.reshape(1, D).astype(jnp.float32))
