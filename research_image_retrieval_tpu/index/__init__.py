"""Index layer: descriptor extraction, similarity search, query expansion,
and gallery serving."""

from research_image_retrieval_tpu.index.extract import (
    extract_vectors,
    multiscale_descriptor,
    resize_bilinear_np,
)
from research_image_retrieval_tpu.index.search import (
    cosine_similarity,
    search_topk,
    rank_full,
)
from research_image_retrieval_tpu.index.qe import (
    alpha_query_expansion,
    IterativeQueryExpansion,
)
from research_image_retrieval_tpu.index.gallery import HybridGallery
from research_image_retrieval_tpu.index.superglobal import (
    gem_aggregate,
    superglobal_rerank,
)
from research_image_retrieval_tpu.index.rerank import (
    rerank_shortlist,
    rerank_shortlist_batched,
    make_cvnet_batch_scorer,
    geometric_verification_batch,
    geometric_verification_score,
    mutual_nn_matches,
)

__all__ = [
    "rerank_shortlist",
    "rerank_shortlist_batched",
    "superglobal_rerank",
    "gem_aggregate",
    "make_cvnet_batch_scorer",
    "geometric_verification_batch",
    "geometric_verification_score",
    "mutual_nn_matches",
    "extract_vectors",
    "multiscale_descriptor",
    "resize_bilinear_np",
    "cosine_similarity",
    "search_topk",
    "rank_full",
    "alpha_query_expansion",
    "IterativeQueryExpansion",
    "HybridGallery",
]
