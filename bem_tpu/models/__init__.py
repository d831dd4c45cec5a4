"""Model runtimes (MODEL_REGISTRY) — reference: basicsr/models/."""

from typing import Any, Dict

from ..utils.registry import MODEL_REGISTRY
from . import image_enhancer_model, condition_generator_model  # noqa: F401
from .base_model import BaseModel, TrainState


def build_model(opt: Dict[str, Any]):
    """Instantiate a model runtime from a parsed Options dict
    (models/__init__.py:18-29)."""
    return MODEL_REGISTRY.get(opt["model_type"])(opt)
