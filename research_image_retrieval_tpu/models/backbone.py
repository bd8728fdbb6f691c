"""ResNet backbones in Flax (NHWC, TPU-native) with stage-tap API.

Functional re-design of the reference backbone wrappers
(reference: networks/backbone.py:60-216): a single ``ResNet`` module with an
``out_stages`` argument replaces the reference's four copy-pasted classes
(ResNet / ResNet_STAGE45 / ResNet_STAGE4 / ResNet_S4); the block5-dilation
surgery (reference: utils/helpfunc.py:177-197) is a constructor flag rather
than post-hoc module mutation.

TPU-first notes:
* NHWC layout end-to-end — the native layout for TPU convolutions.
* SyncBatchNorm (reference: spca_train.py:138) has no explicit knob here
  **by design**: the train loop is jit-over-sharded-batch (GSPMD), where
  ``jnp.mean`` over the batch axis is a *global* mean — XLA inserts the
  cross-replica reduction automatically, so BN batch statistics are
  always synchronized across the mesh.  The sharded-vs-single-device
  equivalence of loss/grads/batch_stats is pinned by
  tests/test_multichip_equivalence.py and asserted by
  ``__graft_entry__.dryrun_multichip``.
* ``convert_torch_resnet`` ingests torchvision-format state dicts (the
  reference's ``v1``/``v2`` pretrained modes) by key remapping + layout
  transposition; no torch dependency at runtime.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax

from research_image_retrieval_tpu.ops.masking import (
    ceil_half,
    downsample_extents,
    hw_mask,
)

__all__ = [
    "ResNet",
    "convert_torch_resnet",
    "convert_features_resnet",
    "convert_pycls_resnet",
    "RESNET_STAGE_DEPTHS",
    "stage_extents",
]

# stage depths for the torchvision families
RESNET_STAGE_DEPTHS = {
    "resnet18": (2, 2, 2, 2),
    "resnet34": (3, 4, 6, 3),
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}
_BASIC = {"resnet18", "resnet34"}


def stage_extents(
    valid_hw: jnp.ndarray, stage: int, dilation_block5: bool = False
) -> jnp.ndarray:
    """Valid (h, w) extents of a ResNet stage tap from input-pixel extents.

    Stage numbering follows the reference (networks/backbone.py:103-216):
    2 = layer1 (stride 4), 3 = layer2 (stride 8), 4 = layer3 (stride 16),
    5 = layer4 (stride 32, or 16 when dilated).  Sizes follow torch
    padding semantics: every downsampling step is ceil-halving.
    """
    halvings = {2: 2, 3: 3, 4: 4, 5: 4 if dilation_block5 else 5}[stage]
    return downsample_extents(jnp.asarray(valid_hw, jnp.int32), halvings)


def _apply_mask(y: jnp.ndarray, extents: jnp.ndarray | None) -> jnp.ndarray:
    """Zero the padded region so the next spatial op sees exact zero padding.

    A conv's implicit zero padding at the true image boundary and an
    explicitly zeroed pad region are numerically identical, so re-masking
    before every k>1 conv / maxpool makes bucketed-padded extraction
    bit-equal to exact-shape extraction on the valid cells.
    """
    if extents is None:
        return y
    return y * hw_mask(y.shape[1], y.shape[2], extents, dtype=y.dtype)[..., None]


class _StemKernel(nn.Module):
    """Bare [7, 7, 3, 64] stem kernel at the same pytree path / init as
    ``nn.Conv(name="conv1")`` — so the space-to-depth stem below stays
    checkpoint-compatible with the standard stem."""

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (7, 7, 3, 64))


def _space_to_depth_stem(x: jnp.ndarray, kernel: jnp.ndarray, dtype):
    """The 7x7/2 stem conv computed in space-to-depth(2) form — exact.

    The 3-channel 7x7 conv is the single most MXU-hostile op in the net
    (measured 9.5 ms of a 37 ms GeM-R50 extract @1024/b16 — ~8% of its
    roofline; BENCH.md): its im2col contraction depth is 7*7*3 = 147 and
    the input occupies 3 of 8 sublanes.  Rewriting input and kernel
    through space-to-depth(2) gives a 4x4 stride-1 conv over 12 channels
    — identical arithmetic (every tap multiplies the same pixel by the
    same weight; the kernel is zero-padded 7->8 so out-of-range taps
    vanish).

    HONEST NEGATIVE RESULT (BENCH.md): the conv itself runs 1.56x faster
    on-chip (9.52 -> 6.11 ms/b16 @1024), but END-TO-END the flag LOSES
    (extract 37.6 -> 43.0 ms @1024/b16; 4.30 -> 5.38 ms @224/b64):
    the on-device pad + 6D reshape/transpose that forms the
    space-to-depth input materializes an extra full-image round-trip
    through HBM, costing more than the conv saves.  Kept (exact,
    parity-tested, checkpoint-compatible) for pipelines that can deliver
    pre-transformed input; default OFF everywhere.

    x: [B, H, W, 3] -> [B, ceil(H/2), ceil(W/2), 64].
    """
    B, H, W, C = x.shape
    # SAME padding of the 7x7/2 conv (3 each side) + bottom/right zero to
    # an even padded extent; the extra row/col only meets zero kernel taps
    p = jnp.pad(x, ((0, 0), (3, 3 + (H % 2)), (3, 3 + (W % 2)), (0, 0)))
    Ph, Pw = p.shape[1], p.shape[2]
    p2 = p.reshape(B, Ph // 2, 2, Pw // 2, 2, C)
    p2 = p2.transpose(0, 1, 3, 2, 4, 5).reshape(B, Ph // 2, Pw // 2, 4 * C)
    k = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))  # 7x7 -> 8x8
    k = k.reshape(4, 2, 4, 2, C, kernel.shape[-1])
    k = k.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * C, kernel.shape[-1])
    dn = lax.conv_dimension_numbers(p2.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        p2.astype(dtype), k.astype(dtype), (1, 1), "VALID",
        dimension_numbers=dn,
    )


class BottleneckBlock(nn.Module):
    """Bottleneck: 1x1 -> 3x3 -> 1x1, projection skip.

    ``stride_on_conv1=False`` is torchvision v1.5 (stride on the 3x3);
    True is the MSRA/pycls placement (stride on the first 1x1) used by the
    reference's scratch DOLG backbone (reference: networks/backbone.py:305-312).
    """

    width: int
    out_ch: int
    stride: int = 1
    dilation: int = 1
    stride_on_conv1: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        extents: jnp.ndarray | None = None,
    ):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name=name,
        )
        conv = lambda f, k, s, d, name: nn.Conv(
            f,
            (k, k),
            strides=(s, s),
            padding=[(d * (k // 2), d * (k // 2))] * 2,
            kernel_dilation=(d, d),
            use_bias=False,
            dtype=self.dtype,
            name=name,
        )
        identity = x
        s1 = self.stride if self.stride_on_conv1 else 1
        s2 = 1 if self.stride_on_conv1 else self.stride
        y = nn.relu(norm("bn1")(conv(self.width, 1, s1, 1, "conv1")(x)))
        # the 1x1 conv1 + BN leaks bias into the pad region; re-zero before
        # the only spatial conv so its boundary reads are exact zero
        # padding (a strided 1x1 halves the valid extent first)
        ext1 = (
            ceil_half(extents)
            if extents is not None and s1 == 2 else extents
        )
        y = _apply_mask(y, ext1)
        y = nn.relu(
            norm("bn2")(conv(self.width, 3, s2, self.dilation, "conv2")(y))
        )
        y = norm("bn3")(conv(self.out_ch, 1, 1, 1, "conv3")(y))
        if identity.shape[-1] != self.out_ch or self.stride != 1:
            identity = norm("downsample_bn")(
                conv(self.out_ch, 1, self.stride, 1, "downsample_conv")(identity)
            )
        return nn.relu(y + identity)


class BasicBlock(nn.Module):
    """torchvision basic block: 3x3(stride) -> 3x3, projection skip."""

    width: int
    out_ch: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        extents: jnp.ndarray | None = None,
    ):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name=name,
        )
        conv = lambda f, k, s, d, name: nn.Conv(
            f,
            (k, k),
            strides=(s, s),
            padding=[(d * (k // 2), d * (k // 2))] * 2,
            kernel_dilation=(d, d),
            use_bias=False,
            dtype=self.dtype,
            name=name,
        )
        identity = x
        x = _apply_mask(x, extents)
        y = nn.relu(norm("bn1")(conv(self.out_ch, 3, self.stride, self.dilation, "conv1")(x)))
        out_extents = (
            ceil_half(extents)
            if extents is not None and self.stride == 2
            else extents
        )
        y = _apply_mask(y, out_extents)
        y = norm("bn2")(conv(self.out_ch, 3, 1, self.dilation, "conv2")(y))
        if identity.shape[-1] != self.out_ch or self.stride != 1:
            identity = norm("downsample_bn")(
                conv(self.out_ch, 1, self.stride, 1, "downsample_conv")(identity)
            )
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """ResNet-{18,34,50,101,152} with stage taps and optional block5 dilation.

    Args:
      name: torchvision family name ("resnet50", "resnet101", ...).
      out_stages: which stage outputs to return.  Stages follow the
        reference's block numbering: 2 = post-stem layer1 output,
        3 = layer2, 4 = layer3 (1024ch), 5 = layer4 (2048ch).
        A single stage returns the tensor; several return a dict.
      dilation_block5: replace layer4's stride-2 with dilation-2 3x3s
        (reference: utils/helpfunc.py:177-197) — preserves resolution.
      stride_on_conv1: MSRA/pycls stride placement (on the first 1x1 of
        each bottleneck) — the reference's scratch DOLG backbone layout
        (networks/backbone.py:218-346); default is torchvision v1.5.
      dtype: compute dtype (bf16 for TPU training; params stay fp32).
    """

    name_: str = "resnet50"
    out_stages: Sequence[int] = (5,)
    dilation_block5: bool = False
    stride_on_conv1: bool = False
    # compute the 7x7/2 stem in space-to-depth(2) form — identical math,
    # same "conv1" param tree (checkpoint-compatible).  Measured NET LOSS
    # end-to-end on-chip (the input transform outweighs the conv gain —
    # see _space_to_depth_stem); keep False unless input arrives
    # pre-transformed
    stem_s2d: bool = False
    dtype: Any = jnp.float32

    @property
    def outputdim_block5(self) -> int:
        return 512 if self.name_ in _BASIC else 2048

    @property
    def outputdim_block4(self) -> int:
        return 256 if self.name_ in _BASIC else 1024

    @nn.compact
    def __call__(self, x, train: bool = False, valid_hw: jnp.ndarray | None = None):
        """Forward pass.

        Args:
          x: [B, H, W, 3] images (padded bottom/right with zeros when
            ``valid_hw`` is given).
          train: training mode (batch-stat BN, SyncBN axis).
          valid_hw: optional [B, 2] int array of valid (height, width)
            input-pixel extents for bucketed variable-resolution
            extraction.  Requires ``train=False`` (BN batch statistics
            over padded pixels would be wrong).  Use ``stage_extents`` to
            derive the matching feature-map extents of each tap.
        """
        if valid_hw is not None and train:
            raise ValueError("masked extraction requires train=False")
        ext = None if valid_hw is None else jnp.asarray(valid_hw, jnp.int32)
        depths = RESNET_STAGE_DEPTHS[self.name_]
        basic = self.name_ in _BASIC
        block_cls: Callable = BasicBlock if basic else BottleneckBlock
        expansion = 1 if basic else 4

        # stem (block1): 7x7/2 conv + BN + relu + 3x3/2 maxpool
        x = _apply_mask(x, ext)
        if self.stem_s2d:
            y = _space_to_depth_stem(x, _StemKernel(name="conv1")(),
                                     self.dtype)
        else:
            y = nn.Conv(
                64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                use_bias=False, dtype=self.dtype, name="conv1",
            )(x)
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn1",
        )(y)
        y = nn.relu(y)
        if ext is not None:
            ext = ceil_half(ext)
            # post-ReLU values are >= 0, so zeroed padding can't win the
            # max — identical to torch/flax -inf padding on the valid cells
            y = _apply_mask(y, ext)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        if ext is not None:
            ext = ceil_half(ext)

        taps = {}
        widths = (64, 128, 256, 512)
        for i, (depth, w) in enumerate(zip(depths, widths)):
            stage = i + 2  # reference block numbering: layer1 -> block2
            first_stride = 1 if i == 0 else 2
            dilation = 1
            if stage == 5 and self.dilation_block5:
                first_stride, dilation = 1, 2
            for j in range(depth):
                stride = first_stride if j == 0 else 1
                extra = (
                    {} if basic
                    else {"stride_on_conv1": self.stride_on_conv1}
                )
                y = block_cls(
                    width=w,
                    out_ch=w * expansion,
                    stride=stride,
                    # reference dilation surgery leaves the first block's
                    # 3x3 undilated unless dilation_0 is given
                    # (helpfunc.py:181-189); match that default.
                    dilation=1 if (j == 0 and stage == 5 and self.dilation_block5) else dilation,
                    dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                    **extra,
                )(y, train=train, extents=ext)
                if ext is not None and stride == 2:
                    ext = ceil_half(ext)
            taps[stage] = y

        outs = {s: taps[s] for s in self.out_stages}
        if len(self.out_stages) == 1:
            return outs[self.out_stages[0]]
        return outs


def _t(x) -> np.ndarray:
    """torch tensor / array -> numpy."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def convert_torch_resnet(state_dict: dict, name: str = "resnet50") -> dict:
    """Convert a torchvision-format ResNet state dict to Flax variables.

    Accepts the key layout of ``torchvision.models.resnet*().state_dict()``
    (the reference's v1/v2 pretrained modes, networks/backbone.py:60-87).
    Conv kernels are transposed OIHW -> HWIO for NHWC.

    Returns:
      {"params": ..., "batch_stats": ...} matching ``ResNet(name_=name)``.
    """
    depths = RESNET_STAGE_DEPTHS[name]
    basic = name in _BASIC
    params: dict = {}
    stats: dict = {}

    def put_conv(dst: dict, flax_name: str, torch_key: str):
        w = _t(state_dict[torch_key])  # [O, I, H, W]
        dst[flax_name] = {"kernel": np.transpose(w, (2, 3, 1, 0))}

    def put_bn(p: dict, s: dict, flax_name: str, torch_prefix: str):
        p[flax_name] = {
            "scale": _t(state_dict[f"{torch_prefix}.weight"]),
            "bias": _t(state_dict[f"{torch_prefix}.bias"]),
        }
        s[flax_name] = {
            "mean": _t(state_dict[f"{torch_prefix}.running_mean"]),
            "var": _t(state_dict[f"{torch_prefix}.running_var"]),
        }

    put_conv(params, "conv1", "conv1.weight")
    put_bn(params, stats, "bn1", "bn1")

    n_convs = 2 if basic else 3
    for i, depth in enumerate(depths):
        for j in range(depth):
            tp = f"layer{i + 1}.{j}"
            bp: dict = {}
            bs: dict = {}
            for k in range(1, n_convs + 1):
                put_conv(bp, f"conv{k}", f"{tp}.conv{k}.weight")
                put_bn(bp, bs, f"bn{k}", f"{tp}.bn{k}")
            if f"{tp}.downsample.0.weight" in state_dict:
                put_conv(bp, "downsample_conv", f"{tp}.downsample.0.weight")
                put_bn(bp, bs, "downsample_bn", f"{tp}.downsample.1")
            key = f"layer{i + 1}_{j}"
            params[key] = bp
            stats[key] = bs

    return {"params": params, "batch_stats": stats}


def convert_features_resnet(state_dict: dict, name: str = "resnet101") -> dict:
    """Convert a features-Sequential ResNet state dict (Caffe/``filip`` mode).

    The reference's ``filip`` pretrained mode loads a Caffe-converted
    ResNet101 whose state dict is keyed by ``nn.Sequential`` indices over
    torchvision's children (reference: networks/backbone.py:84-88 —
    ``nn.Sequential(*children[:-2]).load_state_dict``): ``0`` = conv1,
    ``1`` = bn1, ``4``..``7`` = layer1..layer4.  Remaps to torchvision
    keys and delegates to ``convert_torch_resnet``.  Pair with the BGR +
    0-255 input convention of Caffe weights (data.transforms ``bgr``).
    """
    remap = {}
    for k, v in state_dict.items():
        head, _, rest = k.partition(".")
        if head == "0":
            remap["conv1." + rest] = v
        elif head == "1":
            remap["bn1." + rest] = v
        elif head in ("2", "3"):
            continue  # relu / maxpool have no parameters
        else:
            remap[f"layer{int(head) - 3}." + rest] = v
    return convert_torch_resnet(remap, name)


def convert_pycls_resnet(state_dict: dict, name: str = "resnet101") -> dict:
    """Convert a pycls-layout ResNet state dict (the reference's scratch
    DOLG backbone, ``ResStemIN``/``ResStage``/``BottleneckTransform`` —
    reference: networks/backbone.py:218-346) to Flax variables.

    Key layout: ``stem.{conv,bn}``, ``s{1..4}.b{j}.f.{a,a_bn,b,b_bn,c,c_bn}``
    plus ``s{i}.b{j}.{proj,bn}`` on shape-changing blocks.  Use with
    ``ResNet(stride_on_conv1=True)`` — pycls puts the stride on the first
    1x1 ('a') conv, not the 3x3.
    """
    depths = RESNET_STAGE_DEPTHS[name]
    params: dict = {}
    stats: dict = {}

    def put_conv(dst: dict, flax_name: str, torch_key: str):
        w = _t(state_dict[torch_key])
        dst[flax_name] = {"kernel": np.transpose(w, (2, 3, 1, 0))}

    def put_bn(p: dict, s: dict, flax_name: str, torch_prefix: str):
        p[flax_name] = {
            "scale": _t(state_dict[f"{torch_prefix}.weight"]),
            "bias": _t(state_dict[f"{torch_prefix}.bias"]),
        }
        s[flax_name] = {
            "mean": _t(state_dict[f"{torch_prefix}.running_mean"]),
            "var": _t(state_dict[f"{torch_prefix}.running_var"]),
        }

    put_conv(params, "conv1", "stem.conv.weight")
    put_bn(params, stats, "bn1", "stem.bn")

    for i, depth in enumerate(depths):
        for j in range(depth):
            tp = f"s{i + 1}.b{j + 1}"
            bp: dict = {}
            bs: dict = {}
            for flax_c, flax_b, t in (
                ("conv1", "bn1", "a"), ("conv2", "bn2", "b"),
                ("conv3", "bn3", "c"),
            ):
                put_conv(bp, flax_c, f"{tp}.f.{t}.weight")
                put_bn(bp, bs, flax_b, f"{tp}.f.{t}_bn")
            if f"{tp}.proj.weight" in state_dict:
                put_conv(bp, "downsample_conv", f"{tp}.proj.weight")
                put_bn(bp, bs, "downsample_bn", f"{tp}.bn")
            key = f"layer{i + 1}_{j}"
            params[key] = bp
            stats[key] = bs

    return {"params": params, "batch_stats": stats}
