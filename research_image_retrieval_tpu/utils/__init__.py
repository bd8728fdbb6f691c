"""Utilities: config tree, profiling, debug helpers."""

from research_image_retrieval_tpu.utils.config import (
    TrainConfig,
    EvalConfig,
    PRESETS,
    get_preset,
)

__all__ = ["TrainConfig", "EvalConfig", "PRESETS", "get_preset"]
