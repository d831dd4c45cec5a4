"""Shared blocks for the baseline model zoo (reference: analysis/model_zoo/).

NHWC flax re-implementations used by the PSNR-vs-FLOPs comparison. Parameter
shapes/counts match the torch references exactly (verified by
tests/test_model_zoo.py) so FLOPs/params numbers are comparable.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...nn.layers import Conv2d, ConvTranspose2d, Dense, PReLU, pixel_shuffle, pixel_unshuffle


class MeanShift(nn.Module):
    """RGB mean shift as a (frozen-by-convention) 1x1 conv
    (analysis/model_zoo/rcan.py:14-23). Parameters exist for count parity."""

    rgb_range: float = 255.0
    rgb_mean: Sequence[float] = (0.4488, 0.4371, 0.4040)
    rgb_std: Sequence[float] = (1.0, 1.0, 1.0)
    sign: int = -1

    @nn.compact
    def __call__(self, x):
        std = np.asarray(self.rgb_std, np.float32)
        w0 = (np.eye(3, dtype=np.float32) / std[:, None]).T  # HWIO 1x1 view
        b0 = self.sign * self.rgb_range * np.asarray(self.rgb_mean, np.float32) / std
        w = self.param("weight", lambda k: jnp.asarray(w0.reshape(1, 1, 3, 3)))
        b = self.param("bias", lambda k: jnp.asarray(b0))
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b


class CALayer(nn.Module):
    """Channel attention (squeeze-excite with sigmoid)
    (rcan.py:128-144 / HWMNet.py:188-203)."""

    channel: int
    reduction: int = 16
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = Conv2d(self.channel // self.reduction, 1, padding=0,
                   use_bias=self.use_bias, name="du1")(y)
        y = jax.nn.relu(y)
        y = Conv2d(self.channel, 1, padding=0, use_bias=self.use_bias,
                   name="du2")(y)
        return x * jax.nn.sigmoid(y)


class SALayer(nn.Module):
    """Spatial attention over max/mean channel pools (HWMNet.py:168-183)."""

    kernel_size: int = 5

    @nn.compact
    def __call__(self, x):
        mx = jnp.max(x, axis=-1, keepdims=True)
        av = jnp.mean(x, axis=-1, keepdims=True)
        y = jnp.concatenate([mx, av], axis=-1)
        y = Conv2d(1, self.kernel_size, padding=(self.kernel_size - 1) // 2,
                   use_bias=False, name="conv")(y)
        return x * jax.nn.sigmoid(y)


def dwt_haar(x):
    """Orthonormal-ish Haar DWT used by HWMNet (HWMNet.py:8-21), NHWC:
    (B, H, W, C) -> (B, H/2, W/2, 4C) ordered [LL, HL, LH, HH]."""
    x01 = x[:, 0::2] / 2
    x02 = x[:, 1::2] / 2
    x1, x3 = x01[:, :, 0::2], x01[:, :, 1::2]
    x2, x4 = x02[:, :, 0::2], x02[:, :, 1::2]
    ll = x1 + x2 + x3 + x4
    hl = -x1 - x2 + x3 + x4
    lh = -x1 + x2 - x3 + x4
    hh = x1 - x2 - x3 + x4
    return jnp.concatenate([ll, hl, lh, hh], axis=-1)


def iwt_haar(x):
    """Inverse of :func:`dwt_haar` (HWMNet.py:23-38), NHWC."""
    c = x.shape[-1] // 4
    x1, x2, x3, x4 = (x[..., i * c:(i + 1) * c] / 2 for i in range(4))
    b, h, w, _ = x.shape
    out = jnp.zeros((b, 2 * h, 2 * w, c), x.dtype)
    out = out.at[:, 0::2, 0::2].set(x1 - x2 - x3 + x4)
    out = out.at[:, 1::2, 0::2].set(x1 - x2 + x3 - x4)
    out = out.at[:, 0::2, 1::2].set(x1 + x2 - x3 - x4)
    out = out.at[:, 1::2, 1::2].set(x1 + x2 + x3 + x4)
    return out


def resize_bilinear_torch(x, size, align_corners=False):
    """torch F.interpolate(bilinear) lookalike, NHWC (both corner modes)."""
    if not align_corners:
        from ...ops.resize import resize_bilinear

        return resize_bilinear(x, size=size)

    b, h, w, c = x.shape
    oh, ow = size

    def axis_weights(n_in, n_out):
        if n_out == 1 or n_in == 1:
            pos = jnp.zeros((n_out,))
        else:
            pos = jnp.arange(n_out) * ((n_in - 1) / (n_out - 1))
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
        hi = jnp.clip(lo + 1, 0, n_in - 1)
        frac = pos - lo
        return lo, hi, frac.astype(x.dtype)

    lo_h, hi_h, fh = axis_weights(h, oh)
    lo_w, hi_w, fw = axis_weights(w, ow)
    top = x[:, lo_h]
    bot = x[:, hi_h]
    rows = top * (1 - fh)[None, :, None, None] + bot * fh[None, :, None, None]
    left = rows[:, :, lo_w]
    right = rows[:, :, hi_w]
    return left * (1 - fw)[None, None, :, None] + right * fw[None, None, :, None]


class LayerNormLast(nn.Module):
    """LN over the channel (last) axis."""

    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        xf = x.astype(jnp.float32)
        m = jnp.mean(xf, axis=-1, keepdims=True)
        v = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - m) * jax.lax.rsqrt(v + 1e-5)
        w = self.param("weight", lambda k: jnp.ones((x.shape[-1],)))
        y = y * w
        if self.use_bias:
            y = y + self.param("bias", lambda k: jnp.zeros((x.shape[-1],)))
        return y.astype(x.dtype)
