"""Effective receptive field analysis (reference: analysis/erf.py).

ERF = |d(center output activation)/d(input)| aggregated over images — one
jax.grad instead of the reference's autograd loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def effective_receptive_field(apply_fn, params, images: np.ndarray) -> np.ndarray:
    """apply_fn(params, x) -> (B, H, W, C) features; images (N, H, W, 3).

    Returns the (H, W) ERF map: mean |gradient| of the center feature wrt
    each input pixel.
    """

    def center_activation(x):
        feats = apply_fn(params, x[None])
        if isinstance(feats, (list, tuple)):
            feats = feats[-1]
        H, W = feats.shape[1], feats.shape[2]
        return jnp.sum(feats[0, H // 2, W // 2])

    grad_fn = jax.jit(jax.grad(center_activation))
    acc = None
    for img in images:
        g = np.abs(np.asarray(grad_fn(jnp.asarray(img)))).sum(-1)
        acc = g if acc is None else acc + g
    return acc / len(images)


def erf_high_contribution_ratio(erf: np.ndarray, thresholds=(0.2, 0.3, 0.5, 0.99)):
    """Fraction of the input area holding each cumulative-energy threshold
    (the reference's high-contribution-area statistic)."""
    flat = np.sort(erf.ravel())[::-1]
    cum = np.cumsum(flat) / flat.sum()
    out = {}
    for t in thresholds:
        out[t] = float(np.searchsorted(cum, t) + 1) / flat.size
    return out
