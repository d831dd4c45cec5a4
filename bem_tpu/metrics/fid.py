"""FID — Fréchet Inception Distance (reference: basicsr/metrics/fid.py, 89 LoC).

The Fréchet distance math is self-contained; the InceptionV3 feature
extractor needs pretrained weights (zero-egress environments can't download
them — point ``BEM_INCEPTION_WEIGHTS`` at a converted .npz; the reference's
extractor is torchvision InceptionV3 pool3 features).
"""

from __future__ import annotations

import os

import numpy as np
from scipy import linalg

from ..utils.registry import METRIC_REGISTRY


def calculate_fid_from_stats(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Fréchet distance between two Gaussians (fid.py calculate_fid)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def extract_inception_features(images: np.ndarray) -> np.ndarray:
    """(N, H, W, 3) [0,1] -> (N, 2048) pool3 features. Weights-gated."""
    path = os.environ.get("BEM_INCEPTION_WEIGHTS")
    if not path or not os.path.exists(path):
        raise RuntimeError(
            "FID needs InceptionV3 weights: set BEM_INCEPTION_WEIGHTS to a "
            "converted .npz (zero-egress environments cannot download them)."
        )
    raise NotImplementedError(
        "InceptionV3 feature extractor wiring lands with the converted "
        "weights; use calculate_fid_from_stats with precomputed features."
    )


@METRIC_REGISTRY.register()
def calculate_fid(feats1: np.ndarray, feats2: np.ndarray, **kwargs) -> float:
    """FID from two feature sets (N, D)."""
    mu1, sigma1 = np.mean(feats1, axis=0), np.cov(feats1, rowvar=False)
    mu2, sigma2 = np.mean(feats2, axis=0), np.cov(feats2, rowvar=False)
    return calculate_fid_from_stats(mu1, sigma1, mu2, sigma2)
