"""MambaIR baseline (reference: analysis/model_zoo/mambaIR.py).

The core SS2D is the classic 4-direction selective scan with z-gating —
exactly our :class:`bem_tpu.nn.ss2d.SS2D` with ``forward_type="v0"``
(same parameter set: in_proj 2x, biased dwconv, x_proj/dt_projs stacks,
A_logs/Ds, LN out-norm, out_proj)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...archs.arch_util import Upsample
from ...nn.layers import Conv2d, Dense, pixel_shuffle
from ...nn.ss2d import SS2D
from .common import LayerNormLast


def _gelu_exact(x):
    # torch nn.GELU default is the exact erf form; jax.nn.gelu
    # defaults to the tanh approximation (a ~1e-3 systematic
    # parity error that compounds over deep stacks)
    import jax
    return jax.nn.gelu(x, approximate=False)


class ChannelAttention(nn.Module):
    """mambaIR.py:17-35."""

    num_feat: int
    squeeze_factor: int = 16

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = Conv2d(self.num_feat // self.squeeze_factor, 1, padding=0,
                   name="down")(y)
        y = jax.nn.relu(y)
        y = Conv2d(self.num_feat, 1, padding=0, name="up")(y)
        return x * jax.nn.sigmoid(y)


class CAB(nn.Module):
    """mambaIR.py:38-49."""

    num_feat: int
    compress_ratio: int = 3
    squeeze_factor: int = 30

    @nn.compact
    def __call__(self, x):
        y = Conv2d(self.num_feat // self.compress_ratio, 3, padding=1,
                   name="conv1")(x)
        y = _gelu_exact(y)
        y = Conv2d(self.num_feat, 3, padding=1, name="conv2")(y)
        return ChannelAttention(self.num_feat, self.squeeze_factor,
                                name="ca")(y)


class VSSBlockIR(nn.Module):
    """mambaIR.py:282-310 — SS2D branch + CAB branch with learned skip
    scales, both NHWC."""

    hidden_dim: int
    d_state: int = 16
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x):
        y = LayerNormLast(name="ln_1")(x)
        skip1 = self.param("skip_scale", lambda k: jnp.ones((self.hidden_dim,)))
        x = x * skip1 + SS2D(
            d_model=self.hidden_dim, d_state=self.d_state,
            ssm_ratio=self.mlp_ratio, d_conv=3, conv_bias=True,
            forward_type="v0", scan_backend="xla", name="self_attention",
        )(y)
        skip2 = self.param("skip_scale2", lambda k: jnp.ones((self.hidden_dim,)))
        y = LayerNormLast(name="ln_2")(x)
        return x * skip2 + CAB(self.hidden_dim, name="conv_blk")(y)


class ResidualGroupIR(nn.Module):
    """mambaIR.py:546-600 (resi_connection='1conv')."""

    dim: int
    depth: int
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x):
        y = x
        for i in range(self.depth):
            y = VSSBlockIR(self.dim, 16, self.mlp_ratio, name=f"block_{i}")(y)
        y = Conv2d(self.dim, 3, padding=1, name="conv")(y)
        return y + x


class MambaIR(nn.Module):
    """mambaIR.py:370-533; comparison config embed_dim=180, depths (6,)*6,
    pixelshuffle x2 upsampler."""

    in_chans: int = 3
    embed_dim: int = 180
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6)
    mlp_ratio: float = 2.0
    upscale: int = 2
    img_range: float = 1.0
    upsampler: str = "pixelshuffle"
    rgb_mean: Sequence[float] = (0.4488, 0.4371, 0.4040)

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(self.rgb_mean, x.dtype)
        x = (x - mean) * self.img_range
        feat = Conv2d(self.embed_dim, 3, padding=1, name="conv_first")(x)
        # patch_norm LN after embed (patch_size=1 -> identity reshape)
        y = LayerNormLast(name="patch_norm")(feat)
        for i, depth in enumerate(self.depths):
            y = ResidualGroupIR(self.embed_dim, depth, self.mlp_ratio,
                                name=f"layer_{i}")(y)
        y = LayerNormLast(name="norm")(y)
        y = Conv2d(self.embed_dim, 3, padding=1, name="conv_after_body")(y)
        feat = y + feat
        if self.upsampler == "pixelshuffle":
            feat = Conv2d(64, 3, padding=1, name="conv_before_upsample")(feat)
            feat = jax.nn.leaky_relu(feat, 0.01)
            feat = Upsample(self.upscale, 64, name="upsample")(feat)
            out = Conv2d(self.in_chans, 3, padding=1, name="conv_last")(feat)
        elif self.upsampler == "pixelshuffledirect":
            feat = Conv2d((self.upscale ** 2) * self.in_chans, 3, padding=1,
                          name="upsample_conv")(feat)
            out = pixel_shuffle(feat, self.upscale)
        else:
            res = Conv2d(self.in_chans, 3, padding=1, name="conv_last")(feat)
            out = x + res
        return out / self.img_range + mean


def buildMambaIR(upscale=2):
    return MambaIR(embed_dim=180, depths=(6, 6, 6, 6, 6, 6), mlp_ratio=2.0,
                   upscale=upscale, img_range=1.0, upsampler="pixelshuffle")
