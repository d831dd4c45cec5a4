"""USM sharpening (reference: basicsr/utils/img_process_util.py, 83 LoC)."""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def usm_sharp(img: np.ndarray, weight: float = 0.5, radius: int = 50,
              threshold: int = 10) -> np.ndarray:
    """Unsharp masking with soft mask (img: [0,1] HWC float)."""
    if radius % 2 == 0:
        radius += 1
    blur = cv2.GaussianBlur(img, (radius, radius), 0)
    residual = img - blur
    mask = np.abs(residual) * 255 > threshold
    mask = mask.astype(np.float32)
    soft_mask = cv2.GaussianBlur(mask, (radius, radius), 0)
    sharp = np.clip(img + weight * residual, 0, 1)
    return soft_mask * sharp + (1 - soft_mask) * img


def usm_sharp_jax(img, weight: float = 0.5, sigma: float = 8.0,
                  threshold: int = 10, ksize: int = 51):
    """Batched NHWC device-side USM (for on-TPU preprocessing pipelines)."""
    import jax
    import jax.numpy as jnp

    x = jnp.arange(ksize, dtype=jnp.float32) - (ksize - 1) / 2
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / jnp.sum(g)
    k2 = jnp.outer(g, g)
    C = img.shape[-1]
    kern = jnp.tile(k2[:, :, None, None], (1, 1, 1, C)).astype(img.dtype)
    pad = ksize // 2

    def blur_fn(t):
        return jax.lax.conv_general_dilated(
            t, kern, (1, 1), ((pad, pad), (pad, pad)),
            feature_group_count=C, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    blur = blur_fn(img)
    residual = img - blur
    mask = (jnp.abs(residual) * 255 > threshold).astype(img.dtype)
    soft = blur_fn(mask)
    sharp = jnp.clip(img + weight * residual, 0, 1)
    return soft * sharp + (1 - soft) * img
