"""EDSR + RCAN baselines (reference: analysis/model_zoo/edsr.py, rcan.py)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...archs.arch_util import ResidualBlockNoBN, Upsample
from ...nn.layers import Conv2d
from .common import CALayer, MeanShift


class EDSR(nn.Module):
    """EDSR (edsr.py:10-63). NHWC."""

    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 16
    upscale: int = 2
    res_scale: float = 1.0
    img_range: float = 255.0
    rgb_mean: Sequence[float] = (0.4488, 0.4371, 0.4040)

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(self.rgb_mean, x.dtype)
        x = (x - mean) * self.img_range
        x = Conv2d(self.num_feat, 3, padding=1, name="conv_first")(x)
        res = x
        for i in range(self.num_block):
            res = ResidualBlockNoBN(num_feat=self.num_feat,
                                    res_scale=self.res_scale,
                                    name=f"body_{i}")(res)
        res = Conv2d(self.num_feat, 3, padding=1, name="conv_after_body")(res)
        res = res + x
        out = Upsample(self.upscale, self.num_feat, name="upsample")(res)
        out = Conv2d(self.num_out_ch, 3, padding=1, name="conv_last")(out)
        return out / self.img_range + mean


def buildEDSR():
    return EDSR()


class RCAB(nn.Module):
    """Residual channel attention block (rcan.py:146-166)."""

    n_feat: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        res = Conv2d(self.n_feat, 3, padding=1, name="conv1")(x)
        res = jax.nn.relu(res)
        res = Conv2d(self.n_feat, 3, padding=1, name="conv2")(res)
        res = CALayer(self.n_feat, self.reduction, name="ca")(res)
        return x + res


class ResidualGroup(nn.Module):
    """rcan.py:169-184."""

    n_feat: int
    reduction: int
    n_resblocks: int

    @nn.compact
    def __call__(self, x):
        res = x
        for i in range(self.n_resblocks):
            res = RCAB(self.n_feat, self.reduction, name=f"rcab_{i}")(res)
        res = Conv2d(self.n_feat, 3, padding=1, name="conv")(res)
        return x + res


class RCAN(nn.Module):
    """RCAN at the comparison config: 10 groups x 20 RCABs, 64 feats,
    x2 pixel-shuffle tail (rcan.py:187-247)."""

    n_resgroups: int = 10
    n_resblocks: int = 20
    n_feats: int = 64
    reduction: int = 16
    scale: int = 2

    @nn.compact
    def __call__(self, x):
        x = MeanShift(255.0, sign=-1, name="sub_mean")(x)
        x = Conv2d(self.n_feats, 3, padding=1, name="head")(x)
        res = x
        for i in range(self.n_resgroups):
            res = ResidualGroup(self.n_feats, self.reduction,
                                self.n_resblocks, name=f"group_{i}")(res)
        res = Conv2d(self.n_feats, 3, padding=1, name="body_conv")(res)
        res = res + x
        out = Upsample(self.scale, self.n_feats, name="tail_up")(res)
        out = Conv2d(3, 3, padding=1, name="tail_conv")(out)
        return MeanShift(255.0, sign=1, name="add_mean")(out)


def buildRCAN():
    return RCAN()
