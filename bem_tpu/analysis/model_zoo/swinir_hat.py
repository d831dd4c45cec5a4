"""SwinIR and HAT baselines (reference: analysis/model_zoo/swinIR.py, hat.py).

Shared Swin window-attention machinery, NHWC. Relative-position index
tables and shift masks are computed in numpy at trace time (they are
buffers, not params, in the reference)."""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...archs.arch_util import Upsample
from ...nn.layers import Conv2d, Dense
from .common import LayerNormLast
from .mambair import CAB


def _gelu_exact(x):
    # torch nn.GELU default is the exact erf form; jax.nn.gelu
    # defaults to the tanh approximation (a ~1e-3 systematic
    # parity error that compounds over deep stacks)
    import jax
    return jax.nn.gelu(x, approximate=False)


def window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws, ws, c)


def window_reverse(windows, ws, h, w):
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, h, w, -1)


def rpi_sa(ws: int) -> np.ndarray:
    """Relative position index for window self-attention (hat.py / swinIR)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def rpi_oca(ws: int, overlap_ratio: float) -> np.ndarray:
    """Relative position index for overlapping cross-attention
    (hat.py:896-916)."""
    wse = ws + int(overlap_ratio * ws)
    co = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                              indexing="ij")).reshape(2, -1)
    ce = np.stack(np.meshgrid(np.arange(wse), np.arange(wse),
                              indexing="ij")).reshape(2, -1)
    rel = ce[:, None, :] - co[:, :, None]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - wse + 1
    rel[:, :, 1] += ws - wse + 1
    rel[:, :, 0] *= ws + wse - 1
    return rel.sum(-1)


def shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(-100/0) mask for SW-MSA (hat.py:921-941 / swinIR calculate_mask)."""
    img = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    win = img.reshape(1, h // ws, ws, w // ws, ws, 1)
    win = win.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (swinIR.py / hat.py:129-195)."""

    dim: int
    window_size: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        b_, n, c = x.shape
        nh = self.num_heads
        d = c // nh
        ws = self.window_size
        qkv = Dense(c * 3, use_bias=True, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, nh, d)
        q, k, v = (jnp.moveaxis(qkv[:, :, i], 2, 1) for i in range(3))
        q = q * (d ** -0.5)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)
        table = self.param(
            "relative_position_bias_table",
            lambda key: jnp.zeros(((2 * ws - 1) ** 2, nh)),
        )
        idx = jnp.asarray(rpi_sa(ws).reshape(-1))
        bias = table[idx].reshape(n, n, nh)
        attn = attn + jnp.transpose(bias, (2, 0, 1))[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, nh, n, n) + mask[None, :, None]
            attn = attn.reshape(b_, nh, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = jnp.moveaxis(out, 1, 2).reshape(b_, n, c)
        return Dense(c, use_bias=True, name="proj")(out)


class Mlp(nn.Module):
    in_features: int
    hidden_features: int

    @nn.compact
    def __call__(self, x):
        x = Dense(self.hidden_features, name="fc1")(x)
        x = _gelu_exact(x)
        return Dense(self.in_features, name="fc2")(x)


class SwinBlock(nn.Module):
    """Swin transformer block; with conv_scale>0 it becomes HAT's HAB
    (hat.py:199-309; swinIR SwinTransformerBlock is the conv_scale=0 case)."""

    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float
    conv_scale: float = 0.0
    compress_ratio: int = 3
    squeeze_factor: int = 30

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        # reference: windows shrink to the input when it is smaller, and
        # shifting is disabled then (hat.py:246-249)
        ws = min(self.window_size, h, w)
        shift = self.shift_size if min(h, w) > self.window_size else 0

        shortcut = x
        y = LayerNormLast(name="norm1")(x)

        conv_x = 0.0
        if self.conv_scale:
            conv_x = CAB(c, self.compress_ratio, self.squeeze_factor,
                         name="conv_block")(y) * self.conv_scale

        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(shift_attn_mask(h, w, ws, shift))
        else:
            mask = None
        wins = window_partition(y, ws).reshape(-1, ws * ws, c)
        wins = WindowAttention(c, ws, self.num_heads, name="attn")(wins, mask)
        y = window_reverse(wins.reshape(-1, ws, ws, c), ws, h, w)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = shortcut + y + conv_x
        y = LayerNormLast(name="norm2")(x)
        return x + Mlp(c, int(c * self.mlp_ratio), name="mlp")(y)


class OCAB(nn.Module):
    """Overlapping cross-attention block (hat.py:352-439)."""

    dim: int
    window_size: int
    overlap_ratio: float
    num_heads: int
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ws = self.window_size
        ows = ws + int(self.overlap_ratio * ws)
        pad = (ows - ws) // 2
        nh = self.num_heads
        d = c // nh

        shortcut = x
        y = LayerNormLast(name="norm1")(x)
        qkv = Dense(c * 3, use_bias=True, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        q_wins = window_partition(q, ws).reshape(-1, ws * ws, c)
        kv = jnp.stack([k, v], 0)  # (2, B, H, W, C)
        kv = jnp.pad(kv, ((0, 0), (0, 0), (pad, pad), (pad, pad), (0, 0)))

        def overlap_windows(t):  # (B, H+2p, W+2p, C) -> (B*nw, ows*ows, C)
            nwh, nww = h // ws, w // ws
            idx_h = (np.arange(nwh)[:, None] * ws + np.arange(ows)[None]).reshape(-1)
            idx_w = (np.arange(nww)[:, None] * ws + np.arange(ows)[None]).reshape(-1)
            t = t[:, idx_h][:, :, idx_w]  # (B, nwh*ows, nww*ows, C)
            t = t.reshape(b, nwh, ows, nww, ows, c)
            return jnp.transpose(t, (0, 1, 3, 2, 4, 5)).reshape(-1, ows * ows, c)

        k_wins = overlap_windows(kv[0])
        v_wins = overlap_windows(kv[1])

        b_ = q_wins.shape[0]
        qh = jnp.moveaxis(q_wins.reshape(b_, -1, nh, d), 2, 1) * (d ** -0.5)
        kh = jnp.moveaxis(k_wins.reshape(b_, -1, nh, d), 2, 1)
        vh = jnp.moveaxis(v_wins.reshape(b_, -1, nh, d), 2, 1)
        attn = jnp.einsum("bhnd,bhmd->bhnm", qh, kh)
        table = self.param(
            "relative_position_bias_table",
            lambda key: jnp.zeros(((ws + ows - 1) ** 2, nh)),
        )
        idx = jnp.asarray(rpi_oca(ws, self.overlap_ratio).reshape(-1))
        bias = table[idx].reshape(ws * ws, ows * ows, nh)
        attn = attn + jnp.transpose(bias, (2, 0, 1))[None]
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
        out = jnp.moveaxis(out, 1, 2).reshape(b_, ws * ws, c)
        out = window_reverse(out.reshape(-1, ws, ws, c), ws, h, w)
        x = Dense(c, use_bias=True, name="proj")(out) + shortcut
        y = LayerNormLast(name="norm2")(x)
        return x + Mlp(c, int(c * self.mlp_ratio), name="mlp")(y)


class RSTB(nn.Module):
    """SwinIR residual group (blocks + 3x3 conv), '1conv'."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float

    @nn.compact
    def __call__(self, x):
        y = x
        for i in range(self.depth):
            y = SwinBlock(self.dim, self.num_heads, self.window_size,
                          0 if i % 2 == 0 else self.window_size // 2,
                          self.mlp_ratio, name=f"block_{i}")(y)
        y = Conv2d(self.dim, 3, padding=1, name="conv")(y)
        return y + x


class RHAG(nn.Module):
    """HAT residual hybrid attention group: HABs + OCAB + conv
    (hat.py:537-620)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    overlap_ratio: float = 0.5

    @nn.compact
    def __call__(self, x):
        y = x
        for i in range(self.depth):
            y = SwinBlock(self.dim, self.num_heads, self.window_size,
                          0 if i % 2 == 0 else self.window_size // 2,
                          self.mlp_ratio, self.conv_scale,
                          self.compress_ratio, self.squeeze_factor,
                          name=f"block_{i}")(y)
        y = OCAB(self.dim, self.window_size, self.overlap_ratio,
                 self.num_heads, self.mlp_ratio, name="overlap_attn")(y)
        y = Conv2d(self.dim, 3, padding=1, name="conv")(y)
        return y + x


class SwinIR(nn.Module):
    """swinIR.py:618-855; comparison config: x4 pixelshuffle, embed 180,
    depths (6,)*6, heads 6, window 8, mlp_ratio 2."""

    in_chans: int = 3
    embed_dim: int = 180
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 2.0
    upscale: int = 4
    img_range: float = 1.0
    rgb_mean: Sequence[float] = (0.4488, 0.4371, 0.4040)

    @nn.compact
    def __call__(self, x):
        ws = self.window_size
        h0, w0 = x.shape[1], x.shape[2]
        ph = (ws - h0 % ws) % ws
        pw = (ws - w0 % ws) % ws
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        mean = jnp.asarray(self.rgb_mean, x.dtype)
        x = (x - mean) * self.img_range
        feat = Conv2d(self.embed_dim, 3, padding=1, name="conv_first")(x)
        y = LayerNormLast(name="patch_norm")(feat)
        for i, depth in enumerate(self.depths):
            y = RSTB(self.embed_dim, depth, self.num_heads[i],
                     ws, self.mlp_ratio, name=f"layer_{i}")(y)
        y = LayerNormLast(name="norm")(y)
        y = Conv2d(self.embed_dim, 3, padding=1, name="conv_after_body")(y)
        feat = y + feat
        feat = Conv2d(64, 3, padding=1, name="conv_before_upsample")(feat)
        feat = jax.nn.leaky_relu(feat, 0.01)
        feat = Upsample(self.upscale, 64, name="upsample")(feat)
        out = Conv2d(self.in_chans, 3, padding=1, name="conv_last")(feat)
        out = out / self.img_range + mean
        return out[:, : h0 * self.upscale, : w0 * self.upscale]


def buildSwinIR():
    return SwinIR(upscale=4, window_size=8, img_range=1.0,
                  depths=(6, 6, 6, 6, 6, 6), embed_dim=180,
                  num_heads=(6, 6, 6, 6, 6, 6), mlp_ratio=2.0)


class HAT(nn.Module):
    """hat.py:710-1003; comparison config: x2 pixelshuffle, embed 180,
    depths/heads (6,)*6, window 16, OCAB overlap 0.5, CAB scale 0.01."""

    in_chans: int = 3
    embed_dim: int = 180
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6, 6, 6)
    window_size: int = 16
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    overlap_ratio: float = 0.5
    mlp_ratio: float = 2.0
    upscale: int = 2
    img_range: float = 1.0
    rgb_mean: Sequence[float] = (0.4488, 0.4371, 0.4040)

    @nn.compact
    def __call__(self, x):
        ws = self.window_size
        h0, w0 = x.shape[1], x.shape[2]
        # reference pads by mirrored concat to the next window multiple
        ph = (h0 // ws + 1) * ws - h0
        pw = (w0 // ws + 1) * ws - w0
        x = jnp.concatenate([x, jnp.flip(x, 1)], 1)[:, : h0 + ph]
        x = jnp.concatenate([x, jnp.flip(x, 2)], 2)[:, :, : w0 + pw]
        mean = jnp.asarray(self.rgb_mean, x.dtype)
        x = (x - mean) * self.img_range
        feat = Conv2d(self.embed_dim, 3, padding=1, name="conv_first")(x)
        y = LayerNormLast(name="patch_norm")(feat)
        for i, depth in enumerate(self.depths):
            y = RHAG(self.embed_dim, depth, self.num_heads[i], ws,
                     self.mlp_ratio, self.compress_ratio, self.squeeze_factor,
                     self.conv_scale, self.overlap_ratio,
                     name=f"layer_{i}")(y)
        y = LayerNormLast(name="norm")(y)
        y = Conv2d(self.embed_dim, 3, padding=1, name="conv_after_body")(y)
        feat = y + feat
        feat = Conv2d(64, 3, padding=1, name="conv_before_upsample")(feat)
        feat = jax.nn.leaky_relu(feat, 0.01)
        feat = Upsample(self.upscale, 64, name="upsample")(feat)
        out = Conv2d(self.in_chans, 3, padding=1, name="conv_last")(feat)
        out = out / self.img_range + mean
        return out[:, : h0 * self.upscale, : w0 * self.upscale]


def buildHAT():
    return HAT()
