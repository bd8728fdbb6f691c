"""Data layer: dataset builders, input pipelines, and test fixtures."""

from research_image_retrieval_tpu.data.synthetic import (
    SyntheticRetrievalDataset,
    make_synthetic_gnd,
)
from research_image_retrieval_tpu.data.revisited import RevisitedDataset
from research_image_retrieval_tpu.data.gldv2 import (
    parse_clean_csv,
    relabel_contiguous,
    stratified_split,
    GLDv2FileDataset,
    GLDv2LmdbDataset,
    build_gldv2_train_val,
)
from research_image_retrieval_tpu.data.transforms import (
    TrainTransform,
    EvalTransform,
    imthumbnail,
)
from research_image_retrieval_tpu.data.eval_loader import (
    ImageFromList,
    PrefetchedImages,
)
from research_image_retrieval_tpu.data.pipeline import ShardedBatchIterator
from research_image_retrieval_tpu.data.records import (
    RecordDataset,
    RecordReader,
    convert_lmdb_to_records,
    write_records,
)

__all__ = [
    "SyntheticRetrievalDataset",
    "make_synthetic_gnd",
    "RevisitedDataset",
    "parse_clean_csv",
    "relabel_contiguous",
    "stratified_split",
    "GLDv2FileDataset",
    "GLDv2LmdbDataset",
    "build_gldv2_train_val",
    "TrainTransform",
    "EvalTransform",
    "imthumbnail",
    "ImageFromList",
    "PrefetchedImages",
    "ShardedBatchIterator",
    "RecordDataset",
    "RecordReader",
    "convert_lmdb_to_records",
    "write_records",
]
