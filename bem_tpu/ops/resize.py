"""Resize helpers (torch F.interpolate / cv2 equivalents), channels-last."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jax.Array, size=None, scale: float = None) -> jax.Array:
    """Bilinear resize with half-pixel centers == torch F.interpolate(
    mode='bilinear', align_corners=False) and cv2.INTER_LINEAR."""
    B, H, W, C = x.shape
    if size is None:
        size = (int(H * scale), int(W * scale))
    return jax.image.resize(x, (B, size[0], size[1], C), method="linear")


def resize_nearest(x: jax.Array, size=None, scale: float = None) -> jax.Array:
    B, H, W, C = x.shape
    if size is None:
        size = (int(H * scale), int(W * scale))
    return jax.image.resize(x, (B, size[0], size[1], C), method="nearest")
