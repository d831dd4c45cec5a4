"""Legacy BasicSR native ops, XLA-native (reference: basicsr/ops/).

- fused_leaky_relu: StyleGAN fused bias + LeakyReLU + scale
  (ops/fused_act/, ~400 LoC of CUDA) — one jnp expression on TPU.
- upfirdn2d: upsample -> FIR filter -> downsample (ops/upfirdn2d/, ~750 LoC
  of CUDA) — pad/dilate + conv.
- deform_conv2d / modulated_deform_conv2d: deformable convolution v1/v2
  (ops/dcn/, ~2k LoC of CUDA; used by DCNv2Pack, arch_util.py:232) —
  bilinear gather + matmul formulation (MXU-friendly).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def fused_leaky_relu(x: jax.Array, bias: Optional[jax.Array] = None,
                     negative_slope: float = 0.2,
                     scale: float = 2**0.5) -> jax.Array:
    """(fused_act.py): leaky_relu(x + bias) * scale, bias on channel axis -1."""
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jnp.where(x >= 0, x, negative_slope * x) * scale


def upfirdn2d(x: jax.Array, kernel: jax.Array, up: int = 1, down: int = 1,
              pad: Tuple[int, int] = (0, 0)) -> jax.Array:
    """NHWC upfirdn (upfirdn2d.py native fallback :162-190 semantics)."""
    B, H, W, C = x.shape
    kh, kw = kernel.shape
    # upsample by zero insertion
    if up > 1:
        x = jnp.zeros((B, H, up, W, up, C), x.dtype).at[:, :, 0, :, 0, :].set(x)
        x = x.reshape(B, H * up, W * up, C)
    p0, p1 = pad
    x = jnp.pad(x, ((0, 0), (max(p0, 0), max(p1, 0)), (max(p0, 0), max(p1, 0)), (0, 0)))
    if p0 < 0 or p1 < 0:
        x = x[:, max(-p0, 0): x.shape[1] - max(-p1, 0),
              max(-p0, 0): x.shape[2] - max(-p1, 0)]
    # FIR filter (correlation with flipped kernel == convolution)
    k = jnp.flip(kernel, (0, 1))[:, :, None, None].astype(x.dtype)
    k = jnp.tile(k, (1, 1, 1, C))
    x = jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID", feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if down > 1:
        x = x[:, ::down, ::down]
    return x


def make_resample_kernel(k) -> jax.Array:
    """1D -> separable 2D normalized kernel (upfirdn2d.py:120-138)."""
    k = jnp.asarray(k, jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    return k / jnp.sum(k)


def _bilinear_gather(x: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """x: (B, H, W, C); ys/xs: (B, P) sample coords -> (B, P, C)."""
    B, H, W, C = x.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0

    def gather(yi, xi):
        valid = (yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        v = jax.vmap(lambda img, yy, xx: img[yy, xx])(x, yc, xc)  # (B, P, C)
        return v * valid[..., None].astype(x.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wy = wy[..., None].astype(x.dtype)
    wx = wx[..., None].astype(x.dtype)
    return ((1 - wy) * (1 - wx) * v00 + (1 - wy) * wx * v01
            + wy * (1 - wx) * v10 + wy * wx * v11)


def modulated_deform_conv2d(
    x: jax.Array,          # (B, H, W, Cin)
    offset: jax.Array,     # (B, H', W', 2 * groups * kh * kw) (y, x interleaved)
    mask: Optional[jax.Array],  # (B, H', W', groups * kh * kw) or None (DCNv1)
    weight: jax.Array,     # (kh, kw, Cin, Cout) HWIO
    bias: Optional[jax.Array] = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    deform_groups: int = 1,
) -> jax.Array:
    """Deformable conv v2 as bilinear gather + matmul (deform_conv.py:33-363).

    Offsets follow torchvision/mmcv layout: per kernel tap (dy, dx) pairs.
    """
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    Ho = (H + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    P = Ho * Wo

    base_y = jnp.arange(Ho) * stride - padding
    base_x = jnp.arange(Wo) * stride - padding
    ky = jnp.arange(kh) * dilation
    kx = jnp.arange(kw) * dilation
    # (Ho, Wo, kh, kw) sample grid
    gy = base_y[:, None, None, None] + ky[None, None, :, None]
    gx = base_x[None, :, None, None] + kx[None, None, None, :]

    off = offset.reshape(B, Ho, Wo, deform_groups, kh * kw, 2)
    cg = Cin // deform_groups
    cols = []
    for g in range(deform_groups):
        oy = off[..., g, :, 0].reshape(B, Ho, Wo, kh, kw)
        ox = off[..., g, :, 1].reshape(B, Ho, Wo, kh, kw)
        ys = (gy[None] + oy).reshape(B, P * kh * kw)
        xs = (gx[None] + ox).reshape(B, P * kh * kw)
        xg = x[..., g * cg : (g + 1) * cg]
        sampled = _bilinear_gather(xg, ys, xs).reshape(B, P, kh * kw, cg)
        if mask is not None:
            m = mask.reshape(B, Ho, Wo, deform_groups, kh * kw)[..., g, :]
            sampled = sampled * m.reshape(B, P, kh * kw, 1).astype(sampled.dtype)
        cols.append(sampled)
    cols = jnp.concatenate(
        [c.reshape(B, P, kh * kw, cg) for c in cols], axis=-1
    )  # (B, P, kh*kw, Cin)
    w = weight.reshape(kh * kw * Cin, Cout)
    out = jnp.einsum("bpki,kio->bpo",
                     cols.reshape(B, P, kh * kw, Cin),
                     weight.reshape(kh, kw, Cin, Cout).reshape(kh * kw, Cin, Cout),
                     preferred_element_type=x.dtype)
    if bias is not None:
        out = out + bias
    return out.reshape(B, Ho, Wo, Cout)


def deform_conv2d(x, offset, weight, bias=None, stride=1, padding=1,
                  dilation=1, deform_groups=1):
    """DCNv1 (no modulation mask)."""
    return modulated_deform_conv2d(x, offset, None, weight, bias, stride,
                                   padding, dilation, deform_groups)
