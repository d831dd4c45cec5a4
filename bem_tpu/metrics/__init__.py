"""Metrics (METRIC_REGISTRY) — reference: basicsr/metrics/."""

from copy import deepcopy

from ..utils.registry import METRIC_REGISTRY
from . import psnr_ssim, niqe, uciqe_uiqm  # noqa: F401
from .psnr_ssim import (
    calculate_psnr,
    calculate_ssim,
    calculate_psnr_jax,
    calculate_ssim_jax,
)
from .niqe import calculate_niqe
from .uciqe_uiqm import getUCIQE, getUIQM, calculate_uciqe, calculate_uiqm


def calculate_metric(data, opt):
    """Dispatch by opt['type'] (metrics/__init__.py:11-21)."""
    opt = deepcopy(opt)
    metric_type = opt.pop("type")
    return METRIC_REGISTRY.get(metric_type)(**data, **opt)
