"""Training layer: schedules, optimizers, pjit train loop, metrics,
checkpointing."""

from research_image_retrieval_tpu.train.schedule import warmup_cosine_schedule
from research_image_retrieval_tpu.train.optimizer import (
    make_sgd_optimizer,
    make_adamw_optimizer,
    weight_decay_mask,
)
from research_image_retrieval_tpu.train.loop import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)
from research_image_retrieval_tpu.train.metrics import (
    AverageMeter,
    MetricLogger,
    JsonlWriter,
    TensorBoardWriter,
)
from research_image_retrieval_tpu.train.checkpoint import CheckpointManager, partial_load

__all__ = [
    "warmup_cosine_schedule",
    "make_sgd_optimizer",
    "make_adamw_optimizer",
    "weight_decay_mask",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "AverageMeter",
    "MetricLogger",
    "JsonlWriter",
    "TensorBoardWriter",
    "CheckpointManager",
    "partial_load",
]
