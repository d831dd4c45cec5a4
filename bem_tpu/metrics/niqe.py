"""NIQE — Natural Image Quality Evaluator (no-reference).

Re-implementation of the published NIQE algorithm ("Making a 'Completely
Blind' Image Quality Analyzer", Mittal et al.), numerically matching the
reference (basicsr/metrics/niqe.py:13-199) and the official MATLAB release:
MSCN coefficients -> per-block AGGD fits (18 features) at 2 scales ->
Mahalanobis distance to a pristine multivariate Gaussian.

``niqe_pris_params.npz`` holds the official pristine-model parameters
(mu/cov fitted on the pristine corpus + the 7x7 Gaussian window) from the
NIQE release — model data, shipped verbatim.

This implementation vectorizes the AGGD parameter search across all blocks
(the reference fits block-by-block in Python loops).
"""

from __future__ import annotations

import math
import os

import numpy as np
from scipy.ndimage import convolve
from scipy.special import gamma

from ..utils.matlab_functions import imresize
from ..utils.registry import METRIC_REGISTRY
from .metric_util import reorder_image, to_y_channel

_GAM = np.arange(0.2, 10.001, 0.001)
_R_GAM = np.square(gamma(2.0 / _GAM)) / (gamma(1.0 / _GAM) * gamma(3.0 / _GAM))


def _aggd_params(blocks: np.ndarray):
    """Vectorized AGGD fit. blocks: (N, P) -> (alpha, beta_l, beta_r), each (N,)."""
    neg = np.where(blocks < 0, blocks, np.nan)
    pos = np.where(blocks > 0, blocks, np.nan)
    with np.errstate(invalid="ignore"):
        left_std = np.sqrt(np.nanmean(neg**2, axis=1))
        right_std = np.sqrt(np.nanmean(pos**2, axis=1))
        gammahat = left_std / right_std
        rhat = np.mean(np.abs(blocks), axis=1) ** 2 / np.mean(blocks**2, axis=1)
        rhatnorm = (rhat * (gammahat**3 + 1) * (gammahat + 1)) / (
            (gammahat**2 + 1) ** 2
        )
    pos_idx = np.argmin((_R_GAM[None, :] - rhatnorm[:, None]) ** 2, axis=1)
    alpha = _GAM[pos_idx]
    ratio = np.sqrt(gamma(1.0 / alpha) / gamma(3.0 / alpha))
    return alpha, left_std * ratio, right_std * ratio


def _block_features(blocks: np.ndarray) -> np.ndarray:
    """blocks: (N, bh, bw) -> (N, 18) AGGD features."""
    N = blocks.shape[0]
    flat = blocks.reshape(N, -1)
    feats = []
    alpha, bl, br = _aggd_params(flat)
    feats += [alpha, (bl + br) / 2]
    for shift in ([0, 1], [1, 0], [1, 1], [1, -1]):
        shifted = np.roll(blocks, shift, axis=(1, 2))
        alpha, bl, br = _aggd_params((blocks * shifted).reshape(N, -1))
        mean = (br - bl) * (gamma(2.0 / alpha) / gamma(1.0 / alpha))
        feats += [alpha, mean, bl, br]
    return np.stack(feats, axis=1)


def niqe_core(img: np.ndarray, mu_pris, cov_pris, gaussian_window,
              block_size_h: int = 96, block_size_w: int = 96) -> float:
    assert img.ndim == 2
    h, w = img.shape
    nbh, nbw = h // block_size_h, w // block_size_w
    img = img[: nbh * block_size_h, : nbw * block_size_w].astype(np.float64)

    distparam = []
    for scale in (1, 2):
        mu = convolve(img, gaussian_window, mode="nearest")
        sigma = np.sqrt(
            np.abs(convolve(np.square(img), gaussian_window, mode="nearest") - mu**2)
        )
        normalized = (img - mu) / (sigma + 1)
        bh, bw = block_size_h // scale, block_size_w // scale
        # (nbh, bh, nbw, bw) -> (nbw*nbh, bh, bw) in the reference's
        # column-major block order (niqe.py:113-118: idx_w outer loop)
        blocks = normalized.reshape(nbh, bh, nbw, bw).transpose(2, 0, 1, 3)
        blocks = blocks.reshape(nbw * nbh, bh, bw)
        distparam.append(_block_features(blocks))
        if scale == 1:
            img = imresize(img / 255.0, scale=0.5, antialiasing=True) * 255.0

    distparam = np.concatenate(distparam, axis=1)
    mu_dist = np.nanmean(distparam, axis=0)
    good = distparam[~np.isnan(distparam).any(axis=1)]
    cov_dist = np.cov(good, rowvar=False)
    invcov = np.linalg.pinv((cov_pris + cov_dist) / 2)
    diff = mu_pris - mu_dist
    return float(np.sqrt(diff @ invcov @ diff))


@METRIC_REGISTRY.register()
def calculate_niqe(img, crop_border, input_order="HWC", convert_to="y", **kwargs):
    """NIQE on a [0,255] BGR (or gray) image (reference niqe.py:144-199)."""
    params = np.load(os.path.join(os.path.dirname(__file__), "niqe_pris_params.npz"))
    mu_pris = np.squeeze(params["mu_pris_param"])
    cov_pris = params["cov_pris_param"]
    window = params["gaussian_window"]

    img = np.asarray(img).astype(np.float32)
    if input_order != "HW":
        img = reorder_image(img, input_order=input_order)
        if convert_to == "y":
            img = to_y_channel(img)
        elif convert_to == "gray":
            import cv2

            img = cv2.cvtColor(img / 255.0, cv2.COLOR_BGR2GRAY) * 255.0
        img = np.squeeze(img)
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border]
    img = img.round()
    return niqe_core(img, mu_pris, cov_pris, window)
