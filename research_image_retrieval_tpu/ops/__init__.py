"""Pure-function descriptor ops (the compute core under every model).

All ops use NHWC layout (TPU-native) and are jit/vmap/pjit friendly:
no Python control flow on traced values, static shapes, fp32 accumulation.
"""

from research_image_retrieval_tpu.ops.pooling import (
    gem_pool,
    spoc_pool,
    avg_pool_all,
    max_pool_all,
)
from research_image_retrieval_tpu.ops.norm import fused_input_norm, l2_normalize
from research_image_retrieval_tpu.ops.resize import dense_resize_weights
from research_image_retrieval_tpu.ops.masking import (
    ceil_half,
    downsample_extents,
    hw_mask,
    token_mask,
    mask_attn_logits,
)
from research_image_retrieval_tpu.ops.whiten import (
    pca_whiten_learn,
    apply_whitening,
)
from research_image_retrieval_tpu.ops.losses import (
    arcface_logits,
    arcface_delg_logits,
    madacos_loss,
    cross_entropy,
    topk_errors,
)
from research_image_retrieval_tpu.ops.topk_stream import (
    scan_streaming_topk,
    approx_streaming_topk,
    int8_streaming_topk,
    quantize_gallery_int8,
    streaming_topk,
)
from research_image_retrieval_tpu.ops.gem_pallas import (
    pallas_gem_whiten_l2,
    gem_whiten_l2_reference,
)
from research_image_retrieval_tpu.ops.resblock_pallas import (
    fold_bn,
    fused_bottleneck_reference,
    pallas_fused_bottleneck,
)

__all__ = [
    "gem_pool",
    "spoc_pool",
    "avg_pool_all",
    "max_pool_all",
    "dense_resize_weights",
    "fused_input_norm",
    "l2_normalize",
    "ceil_half",
    "downsample_extents",
    "hw_mask",
    "token_mask",
    "mask_attn_logits",
    "pca_whiten_learn",
    "apply_whitening",
    "arcface_logits",
    "arcface_delg_logits",
    "madacos_loss",
    "cross_entropy",
    "topk_errors",
    "scan_streaming_topk",
    "approx_streaming_topk",
    "int8_streaming_topk",
    "quantize_gallery_int8",
    "streaming_topk",
    "pallas_gem_whiten_l2",
    "gem_whiten_l2_reference",
    "fold_bn",
    "fused_bottleneck_reference",
    "pallas_fused_bottleneck",
]
