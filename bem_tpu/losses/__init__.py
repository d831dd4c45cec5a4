"""Losses (LOSS_REGISTRY) — reference: basicsr/losses/."""

from typing import Any, Dict

from ..utils.registry import LOSS_REGISTRY
from . import basic_loss, gan_loss, my_loss  # noqa: F401
from .basic_loss import L1Loss, MSELoss, CharbonnierLoss, WeightedTVLoss
from .gan_loss import GANLoss, MultiScaleGANLoss, r1_penalty, gradient_penalty_loss


def build_loss(opt: Dict[str, Any]):
    """Instantiate a loss from an Options-style dict (losses/__init__.py:19-27)."""
    opt = dict(opt)
    loss_type = opt.pop("type")
    if loss_type == "PerceptualLoss":
        from .perceptual import PerceptualLoss

        return PerceptualLoss(**opt)
    return LOSS_REGISTRY.get(loss_type)(**opt)
