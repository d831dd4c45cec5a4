"""Noise-map estimation (reference: basicsr/utils/noise_cal.py, 27 LoC).

NHWC jnp version: color-ratio map gradients -> per-pixel noise estimate.
"""

from __future__ import annotations

import jax.numpy as jnp


def calculate_noise_map(x):
    """x: (B, H, W, C) -> noise map (B, H, W, C)."""

    def sub_gradient(t):
        left = jnp.zeros_like(t).at[:, 0:-1].set(t[:, 1:])
        right = jnp.zeros_like(t).at[:, 1:].set(t[:, 0:-1])
        return 0.5 * (left - right)

    low_after_awb = jnp.exp(x)
    color_map = low_after_awb / (low_after_awb.sum(axis=-1, keepdims=True) + 1e-4)
    dx = sub_gradient(color_map)
    dy = jnp.swapaxes(sub_gradient(jnp.swapaxes(color_map, 1, 2)), 1, 2)
    return jnp.maximum(jnp.abs(dx), jnp.abs(dy))
