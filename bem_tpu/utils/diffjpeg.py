"""Differentiable JPEG compression (reference: basicsr/utils/diffjpeg.py,
itself from mlomnitz/DiffJPEG).

Functional jnp pipeline: RGB -> JPEG-YCbCr, 4:2:0 chroma subsampling, 8x8
block DCT, (differentiably rounded) quantization with the standard JPEG
luma/chroma tables scaled by quality, dequantization, IDCT, upsampling,
YCbCr -> RGB. Used for degradation-in-the-loop training.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# standard JPEG quantization tables (transposed like the reference)
_Y_TABLE = np.array(
    [[16, 11, 10, 16, 24, 40, 51, 61], [12, 12, 14, 19, 26, 58, 60, 55],
     [14, 13, 16, 24, 40, 57, 69, 56], [14, 17, 22, 29, 51, 87, 80, 62],
     [18, 22, 37, 56, 68, 109, 103, 77], [24, 35, 55, 64, 81, 104, 113, 92],
     [49, 64, 78, 87, 103, 121, 120, 101], [72, 92, 95, 98, 112, 100, 103, 99]],
    np.float32).T
_C_TABLE = np.full((8, 8), 99, np.float32)
_C_TABLE[:4, :4] = np.array(
    [[17, 18, 24, 47], [18, 21, 26, 66], [24, 26, 56, 99], [47, 66, 99, 99]],
    np.float32).T

# 8x8 DCT basis: dct[x, y, u, v]
_DCT = np.zeros((8, 8, 8, 8), np.float32)
for x in range(8):
    for y in range(8):
        for u in range(8):
            for v in range(8):
                _DCT[x, y, u, v] = np.cos((2 * x + 1) * u * np.pi / 16) * np.cos(
                    (2 * y + 1) * v * np.pi / 16)
_ALPHA = np.array([1.0 / np.sqrt(2)] + [1.0] * 7, np.float32)
_SCALE = np.outer(_ALPHA, _ALPHA) * 0.25


def diff_round(x: jax.Array) -> jax.Array:
    """round(x) + (x - round(x))^3 — differentiable rounding (diffjpeg.py:26)."""
    r = jnp.round(x)
    return r + (x - r) ** 3


def quality_to_factor(quality: float) -> float:
    """JPEG quality -> table scale factor (diffjpeg.py:32-48)."""
    if quality < 50:
        return 5000.0 / quality / 100.0
    return (200.0 - quality * 2) / 100.0


def _rgb_to_ycbcr(img255):
    m = jnp.asarray(
        [[0.299, 0.587, 0.114],
         [-0.168736, -0.331264, 0.5],
         [0.5, -0.418688, -0.081312]], img255.dtype).T
    return img255 @ m + jnp.asarray([0.0, 128.0, 128.0], img255.dtype)


def _ycbcr_to_rgb(ycc):
    m = jnp.asarray(
        [[1.0, 0.0, 1.402], [1.0, -0.344136, -0.714136], [1.0, 1.772, 0.0]],
        ycc.dtype).T
    return (ycc - jnp.asarray([0.0, 128.0, 128.0], ycc.dtype)) @ m


def _blocks(ch):
    """(B, H, W) -> (B, n, 8, 8)."""
    B, H, W = ch.shape
    x = ch.reshape(B, H // 8, 8, W // 8, 8)
    return jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(B, -1, 8, 8)


def _unblocks(blocks, H, W):
    B = blocks.shape[0]
    x = blocks.reshape(B, H // 8, W // 8, 8, 8)
    return jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(B, H, W)


def _dct(blocks):
    dct = jnp.asarray(_DCT, blocks.dtype)
    return jnp.einsum("bnxy,xyuv->bnuv", blocks - 128.0, dct) * jnp.asarray(
        _SCALE, blocks.dtype)


def _idct(coefs):
    alpha = jnp.asarray(np.outer(_ALPHA, _ALPHA), coefs.dtype)
    dct = jnp.asarray(_DCT, coefs.dtype)
    return jnp.einsum("bnuv,xyuv->bnxy", coefs * alpha, dct) * 0.25 + 128.0


def diff_jpeg(img: jax.Array, quality: float = 80,
              rounding=diff_round) -> jax.Array:
    """Differentiable JPEG round-trip. img: (B, H, W, 3) RGB in [0, 1];
    H, W must be multiples of 16 (pad beforehand). Returns same shape/range."""
    B, H, W, _ = img.shape
    assert H % 16 == 0 and W % 16 == 0, "pad H, W to multiples of 16"
    factor = quality_to_factor(quality)
    ycc = _rgb_to_ycbcr(img * 255.0)
    y = ycc[..., 0]
    # 4:2:0 chroma subsampling (2x2 mean)
    cb = ycc[..., 1].reshape(B, H // 2, 2, W // 2, 2).mean(axis=(2, 4))
    cr = ycc[..., 2].reshape(B, H // 2, 2, W // 2, 2).mean(axis=(2, 4))

    y_t = jnp.asarray(_Y_TABLE, img.dtype) * factor
    c_t = jnp.asarray(_C_TABLE, img.dtype) * factor

    def codec(ch, table, h, w):
        coefs = _dct(_blocks(ch))
        q = rounding(coefs / table)
        return _unblocks(_idct(q * table), h, w)

    y2 = codec(y, y_t, H, W)
    cb2 = codec(cb, c_t, H // 2, W // 2)
    cr2 = codec(cr, c_t, H // 2, W // 2)
    # chroma upsampling (nearest 2x, like the reference's repeat)
    cb_up = jnp.repeat(jnp.repeat(cb2, 2, axis=1), 2, axis=2)
    cr_up = jnp.repeat(jnp.repeat(cr2, 2, axis=1), 2, axis=2)
    out = _ycbcr_to_rgb(jnp.stack([y2, cb_up, cr_up], axis=-1))
    return jnp.clip(out / 255.0, 0.0, 1.0)
