"""Index layer: descriptor extraction, similarity search, query expansion,
and gallery serving."""

from research_image_retrieval_tpu.index.extract import (
    extract_vectors,
    multiscale_descriptor,
)
from research_image_retrieval_tpu.index.search import (
    cosine_similarity,
    search_topk,
    rank_full,
)

__all__ = [
    "extract_vectors",
    "multiscale_descriptor",
    "cosine_similarity",
    "search_topk",
    "rank_full",
]
