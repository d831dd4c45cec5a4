"""HOG (Histogram of Oriented Gradients) feature layer.

Bit-parity functional port of the reference's conv-based HOG generator
(reference: basicsr/utils/hog.py:14-113, the MaskFeat-style feature-target
module): per-channel 3x3 Sobel gradients on a reflect-padded image, *signed*
hard binning of ``atan2(gx, gy)`` into ``nbins`` orientation bins over the
full 2*pi range, optional tiled Gaussian-window magnitude weighting, sum
pooling over ``pool x pool`` cells, and L2 normalization across bins
(``F.normalize`` semantics, eps=1e-12).

TPU-native differences are layout-only: input/output are channels-last and
the scatter_add over unique per-pixel bin indices is expressed as a one-hot
multiply (identical numbers, fusible on the VPU instead of a serialized
scatter).

Parity domain: bit-exact on 8-bit-quantized images (where the Sobel sums are
exact in fp32; tests/test_hog_parity.py). On arbitrary float inputs, pixels
whose true gradient is at ulp scale can flip between bins 0 and 8 with the
conv reduction order — an ill-conditioning of the reference's hard signed
binning itself, not of this port.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _gaussian_kernel2d(kernlen: int, std: int, dtype) -> jnp.ndarray:
    """2D Gaussian window, normalized to sum 1 (hog.py:43-56)."""
    n = jnp.arange(kernlen, dtype=jnp.float32)
    n = (n - n.mean()) / std
    w = jnp.exp(-0.5 * n**2)
    g = w[:, None] * w[None, :]
    return (g / g.sum()).astype(dtype)


def hog_features(x: jax.Array, nbins: int = 9, pool: int = 8,
                 gaussian_window: int = 16) -> jax.Array:
    """x: (B, H, W, C) -> (B, H/pool, W/pool, C, nbins).

    Matches ``HOG(nbins, pool, gaussian_window)(x_nchw)`` transposed to
    channels-last: reference output index ``[b, c, k, i, j]`` equals
    ``[b, i, j, c, k]`` here.
    """
    B, H, W, C = x.shape
    # Sobel pair (hog.py:32-36): weight_x detects horizontal gradients,
    # weight_y is its spatial transpose. PyTorch conv2d and
    # lax.conv_general_dilated both cross-correlate, so no kernel flip.
    wx = jnp.asarray([[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]],
                     x.dtype)
    wy = wx.T

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")

    def dwconv(t, k):
        kern = jnp.tile(k[:, :, None, None], (1, 1, 1, C)).astype(t.dtype)
        return jax.lax.conv_general_dilated(
            t, kern, (1, 1), "VALID",
            feature_group_count=C, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    gx = dwconv(xp, wx)
    gy = dwconv(xp, wy)
    norm = jnp.sqrt(gx**2 + gy**2)
    # signed phase, argument order exactly as the reference: atan2(gx, gy)
    # (hog.py:84), scaled to [-nbins, nbins]
    phase = jnp.arctan2(gx, gy) / math.pi * nbins
    bins = jnp.mod(jnp.floor(phase).astype(jnp.int32), nbins)

    if gaussian_window:
        if H != gaussian_window:
            assert H % gaussian_window == 0, f"h {H} gw {gaussian_window}"
            rep = H // gaussian_window
            g = jnp.tile(_gaussian_kernel2d(gaussian_window,
                                            gaussian_window // 2, x.dtype),
                         (rep, rep))
        else:
            g = _gaussian_kernel2d(gaussian_window, gaussian_window // 2,
                                   x.dtype)
        assert g.shape == (H, W), (
            "the reference tiles its square window by H//gw in both dims "
            f"(hog.py:96-101); got window {g.shape} for image {(H, W)}")
        norm = norm * g[None, :, :, None]

    # scatter_add with unique per-pixel indices == one-hot placement
    hist = norm[..., None] * jax.nn.one_hot(bins, nbins, dtype=norm.dtype)

    hist = hist.reshape(B, H, W, C * nbins)
    pooled = jax.lax.reduce_window(
        hist, 0.0, jax.lax.add, (1, pool, pool, 1), (1, pool, pool, 1),
        "VALID")
    pooled = pooled.reshape(B, H // pool, W // pool, C, nbins)
    # F.normalize(p=2, dim=bins): v / max(||v||, 1e-12)  (hog.py:111)
    l2 = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled / jnp.maximum(l2, 1e-12)
