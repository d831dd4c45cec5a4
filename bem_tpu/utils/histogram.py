"""Per-patch Gaussian-KDE histograms — the "histogram" condition mode.

Parity: basicsr/utils/histogram.py:5-59 (compute_histograms), but vectorized
numpy instead of a triple Python loop over (channel, patch_i, patch_j):
bandwidth 0.1 (0.01 variance), bin grid linspace(0,1,bins), +1e-5 smoothing,
normalized to a PDF per patch.
"""

from __future__ import annotations

import numpy as np


def compute_histograms(image: np.ndarray, patch_size: int = 8, bin_count: int = 256) -> np.ndarray:
    """(H, W, 3) in [0,1] -> (C, H//p, W//p, bins) KDE histograms.

    Uses the native C++ threaded kernel when available (bem_tpu/native),
    falling back to the vectorized numpy path."""
    from ..native import kde_histograms as native_kde

    out = native_kde(np.ascontiguousarray(image, np.float32), patch_size, bin_count)
    if out is not None:
        return out
    return _compute_histograms_np(image, patch_size, bin_count)


def _compute_histograms_np(image: np.ndarray, patch_size: int = 8, bin_count: int = 256) -> np.ndarray:
    """Vectorized numpy fallback."""
    H, W, C = image.shape
    assert C == 3, "The image must have 3 channels (RGB)."
    pad_h = (patch_size - H % patch_size) % patch_size
    pad_w = (patch_size - W % patch_size) % patch_size
    if pad_h or pad_w:
        image = np.pad(image, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
    H, W, _ = image.shape
    nh, nw = H // patch_size, W // patch_size
    # (nh, nw, p, p, C) patches
    patches = image.reshape(nh, patch_size, nw, patch_size, C).transpose(0, 2, 1, 3, 4)
    flat = patches.reshape(nh, nw, patch_size * patch_size, C)
    bins = np.linspace(0.0, 1.0, bin_count, dtype=np.float32)
    # kde[i,j,c,b] = mean_pix exp(-0.5 (x - b)^2 / 0.01)
    d = flat[..., None] - bins  # (nh, nw, P, C, bins)
    kde = np.exp(-0.5 * d.astype(np.float32) ** 2 / 0.01).mean(axis=2)  # (nh, nw, C, bins)
    kde = kde + 1e-5
    kde = kde / kde.sum(axis=-1, keepdims=True)
    return kde.transpose(2, 0, 1, 3)  # (C, nh, nw, bins)


def histogram_condition(image: np.ndarray, patch_size: int, bin_count: int) -> np.ndarray:
    """Dataset layout: (H//p, W//p, bins*C) channels-last, bin-major channel
    order matching the reference's permute(3,0,1,2).reshape(-1, h, w)
    (paired_image_dataset.py:356-364)."""
    kde = compute_histograms(image, patch_size, bin_count)  # (C, nh, nw, B)
    stacked = kde.transpose(3, 0, 1, 2)  # (B, C, nh, nw)
    B, C, nh, nw = stacked.shape
    return stacked.reshape(B * C, nh, nw).transpose(1, 2, 0)  # (nh, nw, B*C)
