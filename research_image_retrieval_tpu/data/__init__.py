"""Data layer: dataset builders, input pipelines, and test fixtures."""

from research_image_retrieval_tpu.data.synthetic import (
    SyntheticRetrievalDataset,
    make_synthetic_gnd,
)

__all__ = ["SyntheticRetrievalDataset", "make_synthetic_gnd"]
