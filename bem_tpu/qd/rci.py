"""Reflectance Consistency Index (reference: basicsr/QD/rci.py:8-135).

TPU-native shape: the 11 decompositions (low, 9 blends, high) run as ONE
vmapped batch over blend weights instead of a Python loop of forwards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def compute_rci(decomp_fn, input_low, input_high, num_steps: int = 10,
                return_variance_map: bool = False):
    """decomp_fn: (B, H, W, 3) -> (Q1, Q2); inputs (H, W, 3) or (1, H, W, 3).

    Returns RCI in [0, 1]: 1 - max pixel variance of reflectance across the
    low->high blend sweep, normalized by 0.25 (rci.py:114-118).
    """
    low = jnp.asarray(input_low)
    high = jnp.asarray(input_high)
    if low.ndim == 3:
        low = low[None]
    if high.ndim == 3:
        high = high[None]

    alphas = jnp.arange(num_steps + 1, dtype=jnp.float32) / num_steps  # 0..1
    blended = (1.0 - alphas[:, None, None, None, None]) * low + (
        alphas[:, None, None, None, None] * high
    )  # (S+1, 1, H, W, 3)

    def one(img):
        q1, _ = decomp_fn(img)
        return q1[..., 1:]  # reflectance = imag parts

    Rs = jax.lax.map(one, blended)  # (S+1, 1, H, W, 3)
    variance = jnp.var(Rs, axis=0)[0]  # (H, W, 3)
    max_var = jnp.max(variance)
    metric = jnp.clip(1.0 - max_var / 0.25, 0.0, 1.0)
    if return_variance_map:
        return metric, np.asarray(jnp.max(variance, axis=-1))
    return metric
