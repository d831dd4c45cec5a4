"""Pixel losses (reference: basicsr/losses/basic_loss.py:27-147).

All losses are pure functions wrapped in light classes carrying loss_weight /
reduction, registered in LOSS_REGISTRY for YAML dispatch. Perceptual loss
lives in perceptual.py (needs the VGG feature extractor).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.registry import LOSS_REGISTRY

_REDUCTIONS = ("none", "mean", "sum")


def _reduce(x: jax.Array, reduction: str, weight: Optional[jax.Array]) -> jax.Array:
    if weight is not None:
        x = x * weight
    if reduction == "none":
        return x
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    raise ValueError(f"reduction {reduction!r} not in {_REDUCTIONS}")


@LOSS_REGISTRY.register()
class L1Loss:
    def __init__(self, loss_weight: float = 1.0, reduction: str = "mean"):
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, weight=None):
        return self.loss_weight * _reduce(jnp.abs(pred - target), self.reduction, weight)


@LOSS_REGISTRY.register()
class MSELoss:
    def __init__(self, loss_weight: float = 1.0, reduction: str = "mean"):
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, weight=None):
        return self.loss_weight * _reduce(
            jnp.square(pred - target), self.reduction, weight
        )


@LOSS_REGISTRY.register()
class CharbonnierLoss:
    """sqrt((x - y)^2 + eps) — differentiable L1 variant (basic_loss.py:84)."""

    def __init__(self, loss_weight: float = 1.0, reduction: str = "mean", eps: float = 1e-12):
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.eps = eps

    def __call__(self, pred, target, weight=None):
        return self.loss_weight * _reduce(
            jnp.sqrt(jnp.square(pred - target) + self.eps), self.reduction, weight
        )


@LOSS_REGISTRY.register()
class WeightedTVLoss:
    """Total-variation loss, optionally pixel-weighted (basic_loss.py:118).

    NHWC: diffs along H and W.
    """

    def __init__(self, loss_weight: float = 1.0, reduction: str = "mean"):
        if reduction not in ("mean", "sum"):
            raise ValueError("WeightedTVLoss supports mean | sum")
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, weight=None):
        yw = None if weight is None else weight[:, :-1, :, :]
        xw = None if weight is None else weight[:, :, :-1, :]
        ydiff = _reduce(
            jnp.abs(pred[:, :-1, :, :] - pred[:, 1:, :, :]), self.reduction, yw
        )
        xdiff = _reduce(
            jnp.abs(pred[:, :, :-1, :] - pred[:, :, 1:, :]), self.reduction, xw
        )
        return self.loss_weight * (ydiff + xdiff)


@LOSS_REGISTRY.register()
class PSNRLoss:
    """Negative-PSNR loss (reference my_loss.py variant)."""

    def __init__(self, loss_weight: float = 1.0, reduction: str = "mean", toY: bool = False):
        self.loss_weight = loss_weight
        self.scale = 10.0 / jnp.log(10.0)

    def __call__(self, pred, target, weight=None):
        mse = jnp.mean(jnp.square(pred - target), axis=(1, 2, 3))
        return self.loss_weight * jnp.mean(self.scale * jnp.log(mse + 1e-8))
