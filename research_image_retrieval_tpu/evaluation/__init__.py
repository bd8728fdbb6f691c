"""Revisited Oxford/Paris protocol evaluation (the framework's fidelity gate)."""

from research_image_retrieval_tpu.evaluation.revisited import (
    compute_ap,
    compute_map,
    compute_map_and_print,
    evaluate_revisited,
    RevisitedResult,
)

__all__ = [
    "compute_ap",
    "compute_map",
    "compute_map_and_print",
    "evaluate_revisited",
    "RevisitedResult",
]


def evaluate(cfg):
    """Convenience forwarder to the evaluation driver (lazy import)."""
    from research_image_retrieval_tpu.evaluation.driver import evaluate as _ev

    return _ev(cfg)
