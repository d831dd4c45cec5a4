"""UVM-Net baseline (reference: analysis/model_zoo/UVMNet.py).

The reference depends on the external ``mamba_ssm.Mamba`` CUDA package
(UVMNet.py:5), which cannot even be imported in this environment — the
parameter layout below follows mamba_ssm's documented defaults
(bias=False, conv_bias=True, dt_rank=ceil(d/16)); the scan runs on our
selective-scan op."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn import init as inits
from ...nn.layers import Conv2d, Dense
from ...ops.scan import selective_scan
from .common import LayerNormLast, resize_bilinear_torch


class Mamba1D(nn.Module):
    """mamba_ssm.Mamba lookalike: (B, L, D) -> (B, L, D)."""

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2

    @nn.compact
    def __call__(self, x):
        d_inner = self.expand * self.d_model
        R = math.ceil(self.d_model / 16)
        N = self.d_state
        B_, L, _ = x.shape

        xz = Dense(2 * d_inner, use_bias=False, name="in_proj")(x)
        xs, z = jnp.split(xz, 2, axis=-1)
        # causal depthwise conv1d over L (padding d_conv-1, crop to L)
        w = self.param("conv1d_weight", inits.torch_default_kernel,
                       (self.d_conv, 1, d_inner))
        b = self.param("conv1d_bias", inits.torch_default_bias(self.d_conv),
                       (d_inner,))
        xp = jnp.pad(xs, ((0, 0), (self.d_conv - 1, 0), (0, 0)))
        xc = jax.lax.conv_general_dilated(
            xp, w, (1,), "VALID", feature_group_count=d_inner,
            dimension_numbers=("NHC", "HIO", "NHC"),
        ) + b
        xc = jax.nn.silu(xc)

        x_dbl = Dense(R + 2 * N, use_bias=False, name="x_proj")(xc)
        dt = Dense(d_inner, use_bias=True, name="dt_proj")(x_dbl[..., :R])
        Bs = x_dbl[..., R : R + N][..., None, :]  # (B, L, 1, N) one group
        Cs = x_dbl[..., R + N :][..., None, :]
        A_log = self.param("A_log", inits.a_log_init(N), (d_inner, N))
        D = self.param("D", inits.ones, (d_inner,))
        A = -jnp.exp(A_log.astype(jnp.float32))
        # one B/C group shared by all d_inner channels (K=1)
        y = selective_scan(xc, dt, A, Bs, Cs, D=D, delta_softplus=True,
                           backend="xla")
        y = y.astype(x.dtype) * jax.nn.silu(z)
        return Dense(self.d_model, use_bias=False, name="out_proj")(y)


class UVMB(nn.Module):
    """UVMNet.py:116-158: conv stem + pixel-sequence and channel-sequence
    Mamba mixing at a fixed 64x64 working size."""

    c: int = 3
    w: int = 64
    h: int = 64

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        y = Conv2d(16, 3, padding=1, name="convb1")(x)
        y = jax.nn.relu(y)
        y = Conv2d(self.c, 3, padding=1, name="convb2")(y)
        x = y + x
        seq = LayerNormLast(name="ln")(x.reshape(b, -1, self.c))
        y1 = Mamba1D(self.c, name="model1")(seq)          # (B, WH, C)
        y1 = jnp.swapaxes(y1, 1, 2)                        # (B, C, WH)
        z = Mamba1D(self.w * self.h, name="model3")(y1)    # channel-seq mix
        z = jnp.swapaxes(z, 1, 2)
        att = jax.nn.softmax(Mamba1D(self.c, name="model2")(seq), axis=-1)
        out = (att * z).reshape(b, self.h, self.w, self.c)
        return Conv2d(self.c, 3, padding=1, name="smooth")(out)


class DoubleConv(nn.Module):
    """UVMNet.py:40-60: UVMB at 64x64 + two conv+BN+ReLU. BatchNorm runs in
    inference mode (running stats as params for count parity)."""

    in_channels: int
    out_channels: int
    mid_channels: int = 0

    @nn.compact
    def __call__(self, x):
        mid = self.mid_channels or self.out_channels
        h, w = x.shape[1], x.shape[2]
        inputs = resize_bilinear_torch(x, (64, 64), align_corners=True)
        out = UVMB(c=self.in_channels, name="ub")(inputs)
        out = resize_bilinear_torch(out, (h, w), align_corners=True) + x
        out = Conv2d(mid, 3, padding=1, use_bias=False, name="conv1")(out)
        out = nn.BatchNorm(use_running_average=True, name="bn1")(out)
        out = jax.nn.relu(out)
        out = Conv2d(self.out_channels, 3, padding=1, use_bias=False,
                     name="conv2")(out)
        out = nn.BatchNorm(use_running_average=True, name="bn2")(out)
        return jax.nn.relu(out)


class UVMNetUNet(nn.Module):
    """UVMNet.py:7-37 (bilinear U-Net with UVMB-augmented DoubleConvs)."""

    n_channels: int = 3

    @nn.compact
    def __call__(self, inp):
        def down(x, cin, cout, name):
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            return DoubleConv(cin, cout, name=name)(x)

        def up(x1, x2, cin, cout, name):
            h, w = x1.shape[1] * 2, x1.shape[2] * 2
            x1 = resize_bilinear_torch(x1, (h, w), align_corners=True)
            dh = x2.shape[1] - h
            dw = x2.shape[2] - w
            x1 = jnp.pad(x1, ((0, 0), (dh // 2, dh - dh // 2),
                              (dw // 2, dw - dw // 2), (0, 0)))
            x = jnp.concatenate([x2, x1], axis=-1)
            return DoubleConv(cin, cout, cin // 2, name=name)(x)

        x1 = DoubleConv(self.n_channels, 64, name="inc")(inp)
        x2 = down(x1, 64, 128, "down1")
        x3 = down(x2, 128, 256, "down2")
        x4 = down(x3, 256, 512, "down3")
        x5 = down(x4, 512, 512, "down4")
        x = up(x5, x4, 1024, 256, "up1")
        x = up(x, x3, 512, 128, "up2")
        x = up(x, x2, 256, 64, "up3")
        x = up(x, x1, 128, 64, "up4")
        return Conv2d(3, 1, padding=0, name="outc")(x) + inp


def buildUVMNet():
    return UVMNetUNet(n_channels=3)
