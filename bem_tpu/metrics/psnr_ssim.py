"""PSNR / SSIM, MATLAB-compatible (reference: basicsr/metrics/psnr_ssim.py).

- numpy versions operate on uint8-range [0,255] HWC arrays exactly like the
  reference (Gaussian 11x11 σ=1.5 window, valid-crop borders) so validation
  PSNR/SSIM numbers are directly comparable.
- ``*_jax`` versions are batched NHWC [0,1] device-side equivalents of the
  reference's ``*_pt`` variants (psnr_ssim.py:54-84,134-170) for on-TPU eval.
"""

from __future__ import annotations

import numpy as np

from ..utils.registry import METRIC_REGISTRY
from .metric_util import reorder_image, to_y_channel


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    # cv2.getGaussianKernel equivalent
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g)


@METRIC_REGISTRY.register()
def calculate_psnr(img, img2, crop_border, input_order="HWC", test_y_channel=False, **kwargs):
    """PSNR on [0,255] images (psnr_ssim.py:11-51)."""
    assert img.shape == img2.shape, f"shapes differ: {img.shape} vs {img2.shape}"
    img = reorder_image(np.asarray(img), input_order)
    img2 = reorder_image(np.asarray(img2), input_order)
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]
    if test_y_channel:
        img = to_y_channel(img)
        img2 = to_y_channel(img2)
    img = img.astype(np.float64)
    img2 = img2.astype(np.float64)
    mse = np.mean((img - img2) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def _filter2d_valid(img: np.ndarray, window: np.ndarray) -> np.ndarray:
    """2D correlation then valid-crop by the window half-size (MATLAB ssim)."""
    try:
        import cv2

        return cv2.filter2D(img, -1, window)[5:-5, 5:-5]
    except ImportError:  # pragma: no cover
        from numpy.lib.stride_tricks import sliding_window_view

        v = sliding_window_view(img, window.shape)
        return np.einsum("ijkl,kl->ij", v, window)


def _ssim_channel(img: np.ndarray, img2: np.ndarray) -> float:
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    window = _gaussian_window(11, 1.5)
    mu1 = _filter2d_valid(img, window)
    mu2 = _filter2d_valid(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = _filter2d_valid(img**2, window) - mu1_sq
    sigma2_sq = _filter2d_valid(img2**2, window) - mu2_sq
    sigma12 = _filter2d_valid(img * img2, window) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return float(ssim_map.mean())


@METRIC_REGISTRY.register()
def calculate_ssim(img, img2, crop_border, input_order="HWC", test_y_channel=False, **kwargs):
    """MATLAB-compatible SSIM on [0,255] images (psnr_ssim.py:87-131)."""
    assert img.shape == img2.shape, f"shapes differ: {img.shape} vs {img2.shape}"
    img = reorder_image(np.asarray(img), input_order)
    img2 = reorder_image(np.asarray(img2), input_order)
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]
    if test_y_channel:
        img = to_y_channel(img)
        img2 = to_y_channel(img2)
    img = img.astype(np.float64)
    img2 = img2.astype(np.float64)
    return float(
        np.mean([_ssim_channel(img[..., i], img2[..., i]) for i in range(img.shape[2])])
    )


# ---------------------------------------------------------------------------
# Batched device-side versions (NHWC, [0,1]) — parity with *_pt variants
# ---------------------------------------------------------------------------


def calculate_psnr_jax(img, img2, crop_border=0, **kwargs):
    import jax.numpy as jnp

    if crop_border != 0:
        img = img[:, crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[:, crop_border:-crop_border, crop_border:-crop_border]
    mse = jnp.mean(jnp.square(img.astype(jnp.float32) - img2.astype(jnp.float32)),
                   axis=(1, 2, 3))
    return 10.0 * jnp.log10(1.0 / (mse + 1e-8))


def calculate_ssim_jax(img, img2, crop_border=0, **kwargs):
    """Batched SSIM on [0,1] NHWC images scaled internally by 255 (psnr_ssim.py:169)."""
    import jax
    import jax.numpy as jnp

    if crop_border != 0:
        img = img[:, crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[:, crop_border:-crop_border, crop_border:-crop_border]
    img = img.astype(jnp.float32) * 255.0
    img2 = img2.astype(jnp.float32) * 255.0
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    C = img.shape[-1]
    win = jnp.asarray(_gaussian_window(11, 1.5), jnp.float32)
    kernel = jnp.tile(win[:, :, None, None], (1, 1, 1, C))

    def conv(t):
        return jax.lax.conv_general_dilated(
            t, kernel, (1, 1), "VALID",
            feature_group_count=C,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    mu1, mu2 = conv(img), conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = conv(img * img) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img * img2) - mu1_mu2
    cs = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs
    return jnp.mean(ssim_map, axis=(1, 2, 3))
