"""Model registry: string name -> (constructor, preset config, metadata).

Replaces the reference's MODEL_REGISTRY / TABLE1_TO_MODEL_MAPPING / shell
scripts (reference: models/wrappers.py:18-237 and src/benchmark/*.sh) with a
single declarative table; per-model hyperparameter presets live here rather
than in launcher scripts.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

__all__ = [
    "MODEL_REGISTRY",
    "register_model",
    "get_model",
    "list_available_models",
    "get_model_info",
    "TABLE1_TO_MODEL_MAPPING",
]


@dataclasses.dataclass(frozen=True)
class ModelEntry:
    name: str
    builder: Callable[..., Any]
    description: str
    defaults: dict
    family: str = ""
    paper: str = ""

    def build(self, **overrides):
        cfg = {**self.defaults, **overrides}
        return self.builder(**cfg)


MODEL_REGISTRY: dict[str, ModelEntry] = {}

# Table-1 paper-name -> registry-name mapping (reference: models/__init__.py)
TABLE1_TO_MODEL_MAPPING: dict[str, str] = {}


def register_model(
    name: str,
    *,
    description: str = "",
    defaults: dict | None = None,
    family: str = "",
    paper: str = "",
    table1_names: tuple = (),
):
    """Decorator registering a model builder under ``name``."""

    def deco(builder):
        MODEL_REGISTRY[name] = ModelEntry(
            name=name,
            builder=builder,
            description=description,
            defaults=dict(defaults or {}),
            family=family,
            paper=paper,
        )
        for t1 in table1_names:
            TABLE1_TO_MODEL_MAPPING[t1] = name
        return builder

    return deco


def get_model(name: str, **overrides):
    """Build a model by registry name (or Table-1 paper name)."""
    key = TABLE1_TO_MODEL_MAPPING.get(name, name)
    if key not in MODEL_REGISTRY:
        raise KeyError(
            f"Unknown model '{name}'. Available: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[key].build(**overrides)


def list_available_models() -> list[str]:
    return sorted(MODEL_REGISTRY)


def get_model_info(name: str) -> dict:
    key = TABLE1_TO_MODEL_MAPPING.get(name, name)
    e = MODEL_REGISTRY[key]
    return {
        "name": e.name,
        "description": e.description,
        "defaults": dict(e.defaults),
        "family": e.family,
        "paper": e.paper,
    }
