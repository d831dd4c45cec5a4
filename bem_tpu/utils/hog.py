"""HOG (Histogram of Oriented Gradients) feature layer
(reference: basicsr/utils/hog.py, a conv-based HOG generator used for
MIM-style feature targets).

Functional jnp version: per-channel Sobel-like gradients, soft orientation
binning into ``nbins``, pooled over ``pool x pool`` cells, L2-normalized.

VARIANT, not bit-parity: the reference uses a 1x3/3x1 gradient pair with
signed HARD scatter binning and tiled per-window gaussian weighting
(hog.py:24-88); this port uses soft unsigned binning and a separable
gaussian profile. Equivalent as an MIM feature target, different numbers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hog_features(x: jax.Array, nbins: int = 9, pool: int = 8,
                 gaussian_window: int = 0) -> jax.Array:
    """x: (B, H, W, C) in [0,1] -> (B, H/pool, W/pool, C*nbins)."""
    B, H, W, C = x.shape
    kx = jnp.asarray([[1, 0, -1]], x.dtype)
    ky = kx.T

    def conv1(t, k):
        kh, kw = k.shape
        kern = jnp.tile(k[:, :, None, None], (1, 1, 1, C)).astype(t.dtype)
        return jax.lax.conv_general_dilated(
            t, kern, (1, 1), ((kh // 2, kh // 2), (kw // 2, kw // 2)),
            feature_group_count=C, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    gx = conv1(x, kx)
    gy = conv1(x, ky)
    mag = jnp.sqrt(gx**2 + gy**2 + 1e-12)
    phase = jnp.arctan2(gy, gx) % jnp.pi  # unsigned orientation [0, pi)

    # soft-assign into nbins orientation channels
    bin_centers = (jnp.arange(nbins) + 0.5) * jnp.pi / nbins
    d = jnp.abs(phase[..., None] - bin_centers)  # (B,H,W,C,nbins)
    d = jnp.minimum(d, jnp.pi - d)
    weights = jnp.maximum(0.0, 1.0 - d * nbins / jnp.pi)
    hist = mag[..., None] * weights  # (B,H,W,C,nbins)

    if gaussian_window:
        g = jnp.exp(-0.5 * ((jnp.arange(H) - H / 2) / (H / 4)) ** 2)
        hist = hist * g[None, :, None, None, None]

    hist = hist.reshape(B, H, W, C * nbins)
    pooled = jax.lax.reduce_window(
        hist, 0.0, jax.lax.add, (1, pool, pool, 1), (1, pool, pool, 1), "VALID"
    )
    norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True) + 1e-6
    return pooled / norm
