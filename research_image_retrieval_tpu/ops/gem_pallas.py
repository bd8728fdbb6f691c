"""Fused GeM pooling + whitening projection + L2 norm as one Pallas kernel.

The descriptor head of the GeM family (reference: RetrievalNet.py:327-354)
is clamp^p -> spatial mean -> ^(1/p) -> 1x1 whiten -> L2 normalize.  This
kernel fuses the whole chain: feature-map blocks stream HBM -> VMEM once,
the pooled vector, whiten matmul (MXU) and normalization all happen
on-chip, and only the final [B, D] descriptor is written back — no
intermediate pooled/projected tensors ever hit HBM.

Supports the bucket-validity mask used by variable-resolution extraction
(mask-aware mean, see ops.pooling).  Layout: Mosaic needs the last two
block dims (8, 128)-aligned, so the kernel processes 8 images per grid
row, the mask rides a 128-lane tile, and the whiten weight is held in
VMEM as bf16 (8 MB at 2048x2048).  TPU grid steps run sequentially per
core, so the accumulator scratch carries across the HW blocks of one
image-row.
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


def _kernel(*refs, p, eps, blk, hw, has_mask):
    if has_mask:
        x_ref, m_ref, w_ref, b_ref, out_ref, acc, cnt = refs
    else:
        x_ref, w_ref, b_ref, out_ref, acc, cnt = refs
    i = pl.program_id(1)
    nblk = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        cnt[:] = jnp.zeros_like(cnt)

    x = x_ref[:].astype(jnp.float32)  # [8, BLK, C]
    if has_mask:
        mask = m_ref[:, :, 0].astype(jnp.float32)  # [8, BLK] (lane-tiled)
    else:
        mask = jnp.ones(x.shape[:2], jnp.float32)
    # zero out padded rows past HW (when HW % blk != 0)
    pos = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1) + i * blk
    mask = jnp.where(pos < hw, mask, 0.0)

    powed = jnp.clip(x, min=eps) ** p
    # masked reduce over the HW block axis (VPU; Mosaic has no batched
    # contraction for this layout)
    acc[:] += jnp.sum(powed * mask[:, :, None], axis=1)
    cnt[:] += jnp.sum(mask, axis=1, keepdims=True)  # [8, 1] into [8, 128]

    @pl.when(i == nblk - 1)
    def _finalize():
        count = jnp.maximum(cnt[:, :1], 1.0)  # [8, 1]
        pooled = (acc[:] / count) ** (1.0 / p)  # [8, C]
        y = (
            jnp.dot(
                pooled, w_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            + b_ref[:]
        )  # [8, D]
        norm = jnp.sqrt(jnp.sum(y * y, axis=1, keepdims=True))
        out_ref[:] = y / jnp.maximum(norm, 1e-12)


def pallas_gem_whiten_l2(
    fmap: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    p: float = 3.0,
    eps: float = 1e-6,
    valid_hw: jnp.ndarray | None = None,
    block: int = 64,
    weight_dtype=jnp.bfloat16,
):
    """Fused descriptor head.

    Args:
      fmap: [B, H, W, C] feature map.
      weight: [C, D] whiten projection (held in VMEM as ``weight_dtype``,
        bf16 by default so a 2048x2048 projection fits alongside the
        feature blocks; fp32 accumulation either way).
      bias: [D].
      valid_hw: optional [B, H, W] bucket mask.
      block: HW rows per grid step (VMEM: 8*block*C*4 bytes).

    Returns:
      [B, D] L2-normalized descriptors (fp32).
    """
    B, H, W, C = fmap.shape
    D = weight.shape[1]
    hw = H * W
    has_mask = valid_hw is not None
    x = fmap.reshape(B, hw, C)
    hw_pad = (-hw) % block
    b_pad = (-B) % 8
    if hw_pad:
        x = jnp.pad(x, ((0, 0), (0, hw_pad), (0, 0)))
    if b_pad:
        x = jnp.pad(x, ((0, b_pad), (0, 0), (0, 0)))
    Bp = x.shape[0]
    nblk = x.shape[1] // block

    inputs = [x]
    in_specs = [
        pl.BlockSpec((8, block, C), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    if has_mask:
        mask = valid_hw.reshape(B, hw).astype(jnp.float32)
        if hw_pad:
            mask = jnp.pad(mask, ((0, 0), (0, hw_pad)))
        if b_pad:
            mask = jnp.pad(mask, ((0, b_pad), (0, 0)))
        # lane-tile the mask so its block is (8, block, 128)-aligned; the
        # unmasked path skips this operand entirely (the in-kernel iota
        # range check covers HW padding for free)
        mask = jnp.broadcast_to(mask[..., None], (*mask.shape, 128))
        inputs.append(mask)
        in_specs.append(
            pl.BlockSpec((8, block, 128), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
        )
    inputs += [weight.astype(weight_dtype),
               bias.reshape(1, D).astype(jnp.float32)]
    in_specs += [
        pl.BlockSpec((C, D), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
    ]

    kernel = functools.partial(
        _kernel, p=p, eps=eps, blk=block, hw=hw, has_mask=has_mask
    )
    mask_bytes = (Bp * (hw + hw_pad) * 128 * 4) if has_mask else 0
    out = pl.pallas_call(
        kernel,
        grid=(Bp // 8, nblk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, D), lambda b, i: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, C), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=Bp * (hw * C * 3 + 2 * C * D),
            bytes_accessed=(Bp * hw * C + C * D + Bp * D) * 4 + mask_bytes,
            transcendentals=Bp * C * 2,
        ),
    )(*inputs)
    return out[:B]
