"""Haar 2D DWT/IWT, channels-last.

Equivalent to the reference's orthonormal-Haar pair (basicsr/QD/model4.py:7-37,
same code in model1-3), which the wavelet Decomp archs reuse
(DecompDualBranchDDWavelet_arch.py:11). Subband order on the channel axis is
(LL, HL, LH, HH), each carrying the original C channels.

Pure strided slicing + adds — XLA fuses these; no kernel needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dwt2(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C) Haar analysis."""
    x01 = x[:, 0::2, :, :] / 2.0
    x02 = x[:, 1::2, :, :] / 2.0
    x1 = x01[:, :, 0::2, :]
    x2 = x02[:, :, 0::2, :]
    x3 = x01[:, :, 1::2, :]
    x4 = x02[:, :, 1::2, :]
    ll = x1 + x2 + x3 + x4
    hl = -x1 - x2 + x3 + x4
    lh = -x1 + x2 - x3 + x4
    hh = x1 - x2 - x3 + x4
    return jnp.concatenate([ll, hl, lh, hh], axis=-1)


def iwt2(x: jax.Array) -> jax.Array:
    """(B, H, W, 4C) -> (B, 2H, 2W, C) Haar synthesis (exact inverse of dwt2)."""
    B, H, W, C4 = x.shape
    C = C4 // 4
    x1 = x[..., 0 * C : 1 * C] / 2.0
    x2 = x[..., 1 * C : 2 * C] / 2.0
    x3 = x[..., 2 * C : 3 * C] / 2.0
    x4 = x[..., 3 * C : 4 * C] / 2.0
    # pixel positions (row, col) within each 2x2 cell
    p00 = x1 - x2 - x3 + x4  # (0::2, 0::2)
    p10 = x1 - x2 + x3 - x4  # (1::2, 0::2)
    p01 = x1 + x2 - x3 - x4  # (0::2, 1::2)
    p11 = x1 + x2 + x3 + x4  # (1::2, 1::2)
    # interleave columns then rows
    top = jnp.stack([p00, p01], axis=3).reshape(B, H, 2 * W, C)
    bot = jnp.stack([p10, p11], axis=3).reshape(B, H, 2 * W, C)
    out = jnp.stack([top, bot], axis=2).reshape(B, 2 * H, 2 * W, C)
    return out
