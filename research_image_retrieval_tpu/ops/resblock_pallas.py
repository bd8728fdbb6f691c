"""Fused inference bottleneck block (1x1 -> 3x3 -> 1x1 + skip) in Pallas.

WHY: BENCH.md's round-3 roofline decomposition showed 1024px extraction
is HBM-bound (93% of the bandwidth roofline) — the only single-chip
lever left is TRAFFIC REDUCTION.  XLA schedules each conv of a
bottleneck block (reference: networks/backbone.py BottleneckBlock /
torchvision Bottleneck) as its own HBM round trip: a stride-1 identity
block at [256, 256, 256] moves ~200 MB/image where the irreducible
traffic is read-x + write-y = 67 MB.  This kernel keeps the whole block
in VMEM: x streams HBM->VMEM once per spatial tile, all three matmuls
(MXU), the folded batch-norm affines, ReLUs and the residual add happen
on-chip, and only the final activation returns to HBM.

Scope: INFERENCE only (BN folded into per-channel scale/bias from the
running statistics) for the stride-1 identity-skip blocks — the 12 of 16
blocks of a ResNet-50 that carry most of the activation traffic.  The
stride-2 / projection blocks and the training path stay on XLA.

HONEST NEGATIVE RESULT (measured on-chip 2026-08-19, BENCH.md): the
kernel LOSES to XLA's unfused conv emitter at every R50 geometry —
@b16 bf16, fused vs the real flax BottleneckBlock: layer1 6.6 vs
4.5 ms, layer2 2.6 vs 2.1 ms, layer3 1.8 vs 1.2 ms.  Two designs were
measured: (v1) halo via passing x thrice with clamped index maps —
triples the HBM stream and erases the fusion win; (v2, this file) halo
rows as tiny pre-sliced inputs — single-read streaming, but the kernel
is then VMEM-VALUE-COPY bound: the im2col shifts/concats + pad + concat
copies move ~25 MB of VMEM values per 4 MB grid step, ~7 touches per
element, putting the kernel at ~16% of its fused-traffic roofline while
XLA's conv emitter does the same shuffles in its MXU operand-staging
pipeline for free.  Conclusion matches the repo's other kernel
post-mortems (Pallas GeM head, space-to-depth stem): on TPU, XLA's conv
codegen is near-unbeatable from Mosaic for dense NHWC convs; fusion
wins must come from cheaper ops (pooling heads, quantized streams).
Kept (correct, tested in interpret mode) as the measured record and for
pipelines with VMEM-resident inputs.

Kernel layout notes (Mosaic):
  * channels ride the lanes (NHWC native); spatial tiles of TH rows x
    full W per grid step, so the (TH*W, C) matmul views are free
    major-dim merges.
  * the 3x3 row halo comes from passing x THREE times with clamped
    block index maps (h-1, h, h+1) — no manual DMA; costs a ~3x re-read
    of x which is still far below the unfused traffic.
  * halo/pad correctness: rows outside [0, H) are zeroed AFTER conv1
    (SAME padding zeroes the 3x3 conv's INPUT feature map, not the
    image), with jnp.where so NaN garbage from clamped/padded blocks
    cannot leak through 0*NaN.
  * fp32 accumulation on the MXU; inter-conv activations are cast back
    to the input dtype (bf16 on TPU) to match the unfused XLA path's
    numerics class.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fold_bn",
    "fused_bottleneck_reference",
    "pallas_fused_bottleneck",
]


def fold_bn(scale, bias, mean, var, eps=1e-5):
    """Fold BN inference stats into a per-channel (scale, bias) pair.

    y = (x - mean)/sqrt(var+eps)*scale + bias == x*s + b.
    Returns a [2, C] fp32 array (row 0 = s, row 1 = b).
    """
    s = scale / jnp.sqrt(var + eps)
    b = bias - mean * s
    return jnp.stack([s, b]).astype(jnp.float32)


def fused_bottleneck_reference(x, w1, sb1, w2, sb2, w3, sb3):
    """Unfused XLA composition of the same folded-BN block (for parity
    tests and non-TPU fallback).  x: [B, H, W, C]; w2: [3, 3, Cw, Cw]."""
    dt = x.dtype

    def affine_relu(t, sb):
        t = t.astype(jnp.float32) * sb[0] + sb[1]
        return jnp.maximum(t, 0.0).astype(dt)

    t = jax.lax.dot_general(
        x, w1.astype(dt), (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    t = affine_relu(t, sb1)
    dn = jax.lax.conv_dimension_numbers(
        t.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
    t = jax.lax.conv_general_dilated(
        t, w2.astype(dt), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    )
    t = affine_relu(t, sb2)
    y = jax.lax.dot_general(
        t, w3.astype(dt), (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = y * sb3[0] + sb3[1] + x.astype(jnp.float32)
    return jnp.maximum(y, 0.0).astype(dt)


def _kernel(x0, th_ref, bh_ref, w1, sb1, w2, sb2, w3, sb3, out, *, th, height):
    h = pl.program_id(1)
    dt = x0.dtype
    _, _, w, cin = x0.shape
    cw = w1.shape[1]

    # halo rows arrive as tiny pre-sliced inputs (x[:, th-1::th] /
    # x[:, th::th]) so the main block is read from HBM exactly ONCE —
    # passing x thrice with clamped index maps (the v1 design) tripled
    # the stream and erased the fusion win (measured: 1.12x layer1,
    # 0.82x layer2).  Out-of-image halo rows carry clamp garbage and are
    # zeroed by the row mask below.
    xwin = jnp.concatenate([th_ref[0], x0[0], bh_ref[0]], axis=0)

    # conv1 (1x1) over the TH+2 haloed rows
    t = jnp.dot(
        xwin.reshape((th + 2) * w, cin), w1[...].astype(dt),
        preferred_element_type=jnp.float32,
    )
    t = jnp.maximum(t * sb1[0] + sb1[1], 0.0).astype(dt)
    t1 = t.reshape(th + 2, w, cw)
    # zero rows whose global 3x3-INPUT row falls outside [0, H): image
    # SAME padding + grid-pad garbage of the clamped halo blocks.
    # jnp.where (not multiply): 0 * NaN-garbage would still be NaN.
    rowpos = h * th - 1 + jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    t1 = jnp.where((rowpos >= 0) & (rowpos < height), t1, jnp.zeros_like(t1))
    t1p = jnp.pad(t1, ((0, 0), (1, 1), (0, 0)))

    # conv2 (3x3 SAME) as three [M, 3*Cw] x [3*Cw, Cw] matmuls
    m = th * w
    acc = jnp.zeros((m, cw), jnp.float32)
    for dy in range(3):
        a = jnp.concatenate(
            [t1p[dy:dy + th, dx:dx + w, :].reshape(m, cw) for dx in range(3)],
            axis=1,
        )
        acc += jnp.dot(a, w2[dy].astype(dt),
                       preferred_element_type=jnp.float32)
    t2 = jnp.maximum(acc * sb2[0] + sb2[1], 0.0).astype(dt)

    # conv3 (1x1) + folded BN + residual + ReLU
    y = jnp.dot(t2, w3[...].astype(dt), preferred_element_type=jnp.float32)
    y = y * sb3[0] + sb3[1] + x0[0].reshape(m, cin).astype(jnp.float32)
    out[0] = jnp.maximum(y, 0.0).reshape(th, w, cin).astype(dt)


@functools.partial(jax.jit, static_argnames=("th", "interpret"))
def pallas_fused_bottleneck(x, w1, sb1, w2, sb2, w3, sb3, *, th=16,
                            interpret=False):
    """Fused stride-1 identity-skip bottleneck block.

    Args:
      x: [B, H, W, C] activations (bf16/fp32).
      w1: [C, Cw] 1x1 kernel;  w2: [3, 3, Cw, Cw] HWIO 3x3 kernel;
      w3: [Cw, C] 1x1 kernel.
      sb1/sb2/sb3: [2, C'] folded BN (see fold_bn).
      th: rows per grid step (VMEM tile height).
    Returns [B, H, W, C], matching ``fused_bottleneck_reference``.
    """
    b, height, w, cin = x.shape
    cw = w1.shape[1]
    w2m = w2.reshape(3, 3 * cw, cw)  # [dy, (dx, cin_w), cout_w]
    nh = -(-height // th)
    # halo rows, one per block boundary: block h needs rows h*th-1 and
    # (h+1)*th.  Strided row slices are cheap in XLA (contiguous-row
    # gather, ~2/th of x) and become ordinary [1, 1, W, C] block inputs.
    # The min() keeps them non-empty when height <= th (then every use
    # is row-masked anyway).
    tops = x[:, min(th - 1, height - 1)::th]  # row h*th-1 at index h-1
    bots = x[:, min(th, height - 1)::th]      # row (h+1)*th at index h

    def hmap(off, n):
        return lambda bi, hi: (bi, jnp.clip(hi + off, 0, n - 1), 0, 0)

    blk = pl.BlockSpec((1, th, w, cin), hmap(0, nh))
    full = lambda a: pl.BlockSpec(a.shape, lambda bi, hi: (0,) * a.ndim)
    kernel = functools.partial(_kernel, th=th, height=height)
    flops = 2 * b * height * w * cin * cw * (2 + 9 * cw // cin)
    return pl.pallas_call(
        kernel,
        grid=(b, nh),
        in_specs=[
            blk,
            pl.BlockSpec((1, 1, w, cin), hmap(-1, tops.shape[1])),
            pl.BlockSpec((1, 1, w, cin), hmap(0, bots.shape[1])),
            full(w1), full(sb1), full(w2m), full(sb2), full(w3), full(sb3),
        ],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(np.prod(x.shape)) * x.dtype.itemsize * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, tops, bots, w1, sb1, w2m, sb2, w3, sb3)
