"""GeM global-descriptor model (the framework's flagship baseline).

Behavioral contract of the reference GeM model
(reference: networks/RetrievalNet.py:327-354):

  train:   backbone -> gem(p=3) -> 1x1 "whiten" projection -> ArcFace(s, m)
           -> cross-entropy
  extract: backbone -> gem -> whiten -> L2 normalize

TPU-first notes: NHWC backbone; the whiten 1x1 conv is a Dense on the
pooled vector (identical math, one fused MXU matmul); ArcFace classifier
weight is a model parameter so pjit can shard the 81313-way GLDv2
classifier over the mesh; supports masked pooling for bucketed
variable-resolution extraction.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from research_image_retrieval_tpu.models.backbone import ResNet, stage_extents
from research_image_retrieval_tpu.models.registry import register_model
from research_image_retrieval_tpu.ops import (
    arcface_logits,
    cross_entropy,
    gem_pool,
    hw_mask,
    l2_normalize,
)

__all__ = ["GeMModel"]


class GeMModel(nn.Module):
    """ResNet-GeM with ArcFace head (dual train/extract API)."""

    backbone_name: str = "resnet50"
    outputdim: int = 2048
    num_classes: int = 81313
    p: float = 3.0
    learnable_p: bool = False
    s: float = 32.0
    m: float = 0.15
    dilation_block5: bool = False
    stem_s2d: bool = False  # space-to-depth stem (exact; see backbone.py)
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(
            name_=self.backbone_name,
            out_stages=(5,),
            dilation_block5=self.dilation_block5,
            stem_s2d=self.stem_s2d,
            dtype=self.dtype,
        )
        self.whiten = nn.Dense(self.outputdim, use_bias=True, dtype=jnp.float32,
                               name="whiten")
        if self.learnable_p:
            self.p_param = self.param(
                "gem_p", lambda _: jnp.asarray([self.p], jnp.float32)
            )
        self.classifier_w = self.param(
            "classifier_w",
            nn.initializers.xavier_uniform(),
            (self.num_classes, self.outputdim),
        )

    def _descriptor(self, x, train: bool, valid_hw=None):
        fmap = self.backbone(x, train=train, valid_hw=valid_hw)
        p = self.p_param if self.learnable_p else self.p
        mask = None
        if valid_hw is not None:
            ext = stage_extents(valid_hw, 5, self.dilation_block5)
            mask = hw_mask(fmap.shape[1], fmap.shape[2], ext)
        pooled = gem_pool(fmap, p=p, valid_hw=mask)
        return self.whiten(pooled)

    def __call__(self, x, labels, train: bool = True):
        """Train forward: (loss, logits)."""
        feat = self._descriptor(x, train=train)
        # the additive angular margin is a TRAINING construct — eval
        # logits are plain scaled cosine (m=0), so argmax accuracy is
        # not penalized on the target class
        logits = arcface_logits(
            feat, self.classifier_w, labels, s=self.s,
            m=self.m if train else 0.0,
        )
        return cross_entropy(logits, labels), logits

    def extract(self, x, valid_hw=None):
        """Extraction forward: L2-normalized global descriptor.

        valid_hw: optional [B, 2] int array of valid (height, width)
        input-pixel extents for bucketed variable-resolution extraction
        (images padded bottom/right with zeros); bucketed output equals
        the exact-shape run on the valid region (tests/test_masked_extract.py).
        """
        return l2_normalize(self._descriptor(x, train=False, valid_hw=valid_hw))

    def extract_fused(self, x, valid_hw=None):
        """Extraction via the fused GeM+whiten+L2 Pallas kernel.

        Identical numerics to ``extract`` (see tests/test_gem_pallas.py);
        the pooled/projected intermediates never leave VMEM.  NOTE: with
        honest in-graph timing plain ``extract`` is FASTER (XLA fuses this
        epilogue itself — BENCH.md); keep this for masked-bucket
        experiments, prefer ``extract`` in production.
        """
        from research_image_retrieval_tpu.ops.gem_pallas import (
            pallas_gem_whiten_l2,
        )

        fmap = self.backbone(x, train=False, valid_hw=valid_hw)
        mask = None
        if valid_hw is not None:
            ext = stage_extents(valid_hw, 5, self.dilation_block5)
            mask = hw_mask(fmap.shape[1], fmap.shape[2], ext)
        p = float(self.p) if not self.learnable_p else self.p_param[0]
        kernel = self.whiten.variables["params"]["kernel"]
        bias = self.whiten.variables["params"]["bias"]
        return pallas_gem_whiten_l2(
            fmap, kernel, bias, p=p, valid_hw=mask
        )


register_model(
    "gem_r50",
    description="ResNet50-GeM global descriptor with ArcFace (reference RetrievalNet.py:327)",
    defaults=dict(backbone_name="resnet50", outputdim=2048, p=3.0, s=32.0, m=0.15),
    family="gem",
    paper="Radenovic et al., Fine-tuning CNN Image Retrieval with No Human Annotation (TPAMI 2018)",
    table1_names=("R50-GeM",),
)(GeMModel)

register_model(
    "gem_r101",
    description="ResNet101-GeM global descriptor with ArcFace",
    defaults=dict(backbone_name="resnet101", outputdim=2048, p=3.0, s=32.0, m=0.15),
    family="gem",
    table1_names=("R101-GeM",),
)(GeMModel)
