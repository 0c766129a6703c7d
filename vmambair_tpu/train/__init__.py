"""Training layer: model wrappers (L2), schedulers, checkpointing, pipeline."""

from __future__ import annotations

import logging

from ..utils.registry import MODEL_REGISTRY
from .base_model import BaseModel, build_optimizer
from .sr_model import SRModel, ImageRestorationModel
from .gan_model import SRGANModel
from .realesrgan_model import RealESRGANModel, RealESRNetModel
from .schedulers import SCHEDULERS, build_scheduler
from . import checkpoint

logger = logging.getLogger("vmambair_tpu")


def build_model(opt: dict):
    """YAML `model_type` -> model instance (reference `build_model`)."""
    model = MODEL_REGISTRY.get(opt["model_type"])(opt)
    logger.info("Model [%s] is created.", model.__class__.__name__)
    return model


__all__ = [
    "build_model",
    "BaseModel",
    "SRModel",
    "ImageRestorationModel",
    "SRGANModel",
    "RealESRGANModel",
    "RealESRNetModel",
    "build_optimizer",
    "build_scheduler",
    "SCHEDULERS",
    "checkpoint",
    "MODEL_REGISTRY",
]
