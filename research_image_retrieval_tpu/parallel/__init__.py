"""Parallelism layer: mesh construction, sharding rules, distributed search.

Replaces the reference's NCCL/DDP stack (reference: utils/helpfunc.py:151-171,
spca_train.py:137-140) with jax.sharding: a named device mesh, GSPMD
shardings under jit, and XLA collectives over ICI.
"""

from research_image_retrieval_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated,
    classifier_sharding,
    shard_train_state_rules,
)
from research_image_retrieval_tpu.parallel.dist_search import (
    default_search_mesh,
    make_sharded_stream_fn,
    place_sharded_gallery,
    sharded_search_topk,
    sharded_streaming_topk,
)
from research_image_retrieval_tpu.parallel.dist_init import (
    init_distributed_mode,
    get_rank,
    get_world_size,
    is_main_process,
)

__all__ = [
    "sharded_streaming_topk",
    "init_distributed_mode",
    "get_rank",
    "get_world_size",
    "is_main_process",
    "make_mesh",
    "data_sharding",
    "replicated",
    "classifier_sharding",
    "shard_train_state_rules",
    "sharded_search_topk",
    "default_search_mesh",
    "make_sharded_stream_fn",
    "place_sharded_gallery",
]
