"""HWMNet-LOL baseline (reference: analysis/model_zoo/HWMNet.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn.layers import Conv2d, PReLU, pixel_shuffle, pixel_unshuffle
from .common import CALayer, SALayer, dwt_haar, iwt_haar, resize_bilinear_torch


class HWB(nn.Module):
    """Half-wavelet dual attention block (HWMNet.py:207-249). The PReLU
    activation module is shared between body and tail like the reference
    (one `act` instance is reused)."""

    n_feat: int
    o_feat: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        act = PReLU(name="act")
        residual = x
        half = self.n_feat // 2
        wavelet_in, identity = x[..., :half], x[..., half:]

        x_dwt = dwt_haar(wavelet_in)  # (B, H/2, W/2, 2*n_feat)
        res = Conv2d(self.n_feat, 3, padding=1, use_bias=False, name="body1")(x_dwt)
        res = act(res)
        res = Conv2d(self.n_feat * 2, 3, padding=1, use_bias=False, name="body2")(res)
        sa = SALayer(name="wsa")(res)
        ca = CALayer(self.n_feat * 2, self.reduction, use_bias=False, name="wca")(res)
        res = jnp.concatenate([sa, ca], axis=-1)
        res = Conv2d(self.n_feat * 2, 1, padding=0, use_bias=False,
                     name="conv1x1")(res) + x_dwt
        wavelet_path = iwt_haar(res)

        out = jnp.concatenate([wavelet_path, identity], axis=-1)
        out = act(Conv2d(self.o_feat, 3, padding=1, use_bias=False,
                         name="conv3x3")(out))
        out = out + Conv2d(self.o_feat, 1, padding=0, use_bias=False,
                           name="conv1x1_final")(residual)
        return out


class PSDown(nn.Module):
    """PixelUnshuffle + 1x1 conv (HWMNet.py:107-117)."""

    out_size: int

    @nn.compact
    def __call__(self, x):
        x = pixel_unshuffle(x, 2)
        return Conv2d(self.out_size, 1, padding=0, name="conv1")(x)


class PSUp(nn.Module):
    """PixelShuffle + 1x1 conv (HWMNet.py:119-128)."""

    out_size: int

    @nn.compact
    def __call__(self, x):
        x = pixel_shuffle(x, 2)
        return Conv2d(self.out_size, 1, padding=0, name="conv1")(x)


class UNetConvBlock(nn.Module):
    """HWB body + 1x1 tail (+ optional PS down) (HWMNet.py:75-95)."""

    in_size: int
    out_size: int
    downsample: bool

    @nn.compact
    def __call__(self, x):
        out = HWB(self.in_size, self.in_size, name="hwb")(x)
        out = Conv2d(self.out_size, 1, padding=0, name="tail")(out)
        if self.downsample:
            down = PSDown(self.out_size, name="down")(out)
            return down, out
        return out


class UNetUpBlock(nn.Module):
    """PS up + fuse skip + conv block (HWMNet.py:97-106)."""

    in_size: int
    out_size: int

    @nn.compact
    def __call__(self, x, bridge):
        up = PSUp(self.out_size, name="up")(x)
        out = jnp.concatenate([up, bridge], axis=-1)
        return UNetConvBlock(self.in_size, self.out_size, False,
                             name="conv_block")(out)


class SKFF(nn.Module):
    """Selective kernel feature fusion (HWMNet.py:131-166)."""

    in_channels: int
    height: int = 3
    reduction: int = 8

    @nn.compact
    def __call__(self, inp_feats):
        d = max(self.in_channels // self.reduction, 4)
        stacked = jnp.stack(inp_feats, axis=1)  # (B, height, H, W, C)
        feats_u = jnp.sum(stacked, axis=1)
        feats_s = jnp.mean(feats_u, axis=(1, 2), keepdims=True)
        feats_z = Conv2d(d, 1, padding=0, use_bias=False, name="du")(feats_s)
        feats_z = PReLU(name="du_act")(feats_z)
        att = jnp.stack(
            [Conv2d(self.in_channels, 1, padding=0, use_bias=False,
                    name=f"fc_{i}")(feats_z) for i in range(self.height)],
            axis=1,
        )  # (B, height, 1, 1, C)
        att = jax.nn.softmax(att, axis=1)
        return jnp.sum(stacked * att, axis=1)


class HWMNet(nn.Module):
    """HWMNet-LOL (HWMNet.py:253-320); comparison config wf=96, depth=4."""

    in_chn: int = 3
    wf: int = 96
    depth: int = 4

    @nn.compact
    def __call__(self, img):
        wf, depth = self.wf, self.depth
        conv01 = Conv2d(wf, 3, padding=1, name="conv_01")

        x1 = conv01(img)
        scale_img = img
        encs = []
        prev = 0
        for i in range(depth):
            down = (i + 1) < depth
            blk = UNetConvBlock(prev + wf, (2 ** i) * wf, down,
                                name=f"down_{i}")
            if i == 0:
                x1, x1_up = blk(x1)
                encs.append(x1_up)
            elif down:
                h, w = scale_img.shape[1] // 2, scale_img.shape[2] // 2
                scale_img = resize_bilinear_torch(scale_img, (h, w))
                x1 = jnp.concatenate([x1, conv01(scale_img)], axis=-1)
                x1, x1_up = blk(x1)
                encs.append(x1_up)
            else:
                h, w = scale_img.shape[1] // 2, scale_img.shape[2] // 2
                scale_img = resize_bilinear_torch(scale_img, (h, w))
                x1 = jnp.concatenate([x1, conv01(scale_img)], axis=-1)
                x1 = blk(x1)
            prev = (2 ** i) * wf

        bottom = Conv2d(wf, 3, padding=1, name="bottom_conv")(x1)
        full = (img.shape[1], img.shape[2])
        ms_result = [resize_bilinear_torch(bottom, full)]
        for j, i in enumerate(reversed(range(depth - 1))):
            skip = Conv2d((2 ** i) * wf, 3, padding=1,
                          name=f"skip_conv_{j}")(encs[-j - 1])
            x1 = UNetUpBlock(prev, (2 ** i) * wf, name=f"up_{j}")(x1, skip)
            up = Conv2d(wf, 3, padding=1, name=f"conv_up_{j}")(
                resize_bilinear_torch(x1, full) if i > 0 else x1)
            ms_result.append(up)
            prev = (2 ** i) * wf

        fused = SKFF(wf, height=depth, name="final_ff")(ms_result)
        return Conv2d(self.in_chn, 3, padding=1, name="last")(fused) + img


def buildHWMNet():
    return HWMNet(in_chn=3, wf=96, depth=4)
