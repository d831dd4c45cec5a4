"""Shared arch building blocks.

Parity: basicsr/archs/arch_util.py (SAM:353, DB:326, CSAF:301, conv_relu:276)
and basicsr/archs/UNet_arch.py helpers (conv_down:54, PatchMerging:58,
deconv_up:85, DualUpSample:97, LN2DLinear:158). Channels-last.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import init as inits
from ..nn.layers import (
    Conv2d,
    Conv2dParams,
    ConvTranspose2d,
    LayerNorm2d,
    PReLU,
    pixel_shuffle,
    pixel_shuffle_cf,
)
from ..ops.resize import resize_bilinear


class ConvDown(nn.Module):
    """conv_down: 4x4 stride-2 conv doubling channels (UNet_arch.py:54-55)."""

    in_channels: int
    bayesian: bool = False
    sigma_init: float = 0.05
    layout: str = "NHWC"

    @nn.compact
    def __call__(self, x):
        return Conv2d(
            self.in_channels * 2, kernel_size=4, strides=2, padding=1,
            use_bias=False, bayesian=self.bayesian, sigma_init=self.sigma_init,
            data_format=self.layout, name="conv",
        )(x)


class PatchMerging(nn.Module):
    """2x2 space-to-channel + LN + 1x1 reduction (UNet_arch.py:58-82)."""

    dim: int
    bayesian: bool = False
    sigma_init: float = 0.05
    layout: str = "NHWC"

    @nn.compact
    def __call__(self, x):
        # reshape/transpose space-to-depth: bit-identical to the reference's
        # four strided slices + concat ([x0,x1,x2,x3] = (wp,hp) channel-block
        # order), but XLA lowers stride-2 slice+concat to four full-tensor
        # gathers on TPU (119 ms at 32x448x640x40) while this form becomes
        # one relayout copy (1.3 ms NHWC / 0.6 ms CF). Measured on v5e.
        if self.layout == "NCHW":
            B, C, H, W = x.shape
            x = x.reshape(B, C, H // 2, 2, W // 2, 2)
            x = jnp.transpose(x, (0, 5, 3, 1, 2, 4))
            x = x.reshape(B, 4 * C, H // 2, W // 2)
            ax = 1
        else:
            B, H, W, C = x.shape
            x = x.reshape(B, H // 2, 2, W // 2, 2, C)
            x = jnp.transpose(x, (0, 1, 3, 4, 2, 5))
            x = x.reshape(B, H // 2, W // 2, 4 * C)
            ax = -1
        # pin the space-to-depth relayout in the stream dtype: XLA otherwise
        # hoists the following LN's f32 convert ABOVE the permute copy, so
        # the big relayout runs at 2x bytes (traced: 11.4 ms convert + 9.3 ms
        # f32 copy instead of a ~5 ms bf16 copy at 32x448x640x40 on v5e)
        x = jax.lax.optimization_barrier(x)
        x = LayerNorm2d(name="norm", axis=ax)(x)
        return Conv2d(
            2 * self.dim, kernel_size=1, padding=0, use_bias=False,
            bayesian=self.bayesian, sigma_init=self.sigma_init,
            data_format=self.layout, name="reduction",
        )(x)


class DeconvUp(nn.Module):
    """deconv_up: 2x2 stride-2 transposed conv halving channels (UNet_arch.py:85-93)."""

    in_channels: int
    layout: str = "NHWC"

    @nn.compact
    def __call__(self, x):
        return ConvTranspose2d(self.in_channels // 2, kernel_size=2, strides=2,
                               data_format=self.layout, name="deconv")(x)


def _fold_dual_upsample(dtype) -> bool:
    """Whether DualUpSample takes the algebraically-folded serving form.

    Default: only on the bf16 stream (serving/bench), where the fp32
    weight-fold reassociation is far below activation rounding. fp32 paths
    (CPU goldens vs the torch oracle at ~1e-6) keep the reference op order.
    Override with BEM_FUSED_UPSAMPLE={0,1}.
    """
    env = os.environ.get("BEM_FUSED_UPSAMPLE")
    if env is not None:
        return env != "0"
    return dtype == jnp.bfloat16


class DualUpSample(nn.Module):
    """Dual pixel-shuffle + bilinear upsample path (UNet_arch.py:97-155)."""

    in_channels: int
    scale_factor: int = 2
    layout: str = "NHWC"

    @nn.compact
    def __call__(self, x, fold_tail=None):
        """fold_tail: optional (c/2, d) matrix composed onto the output —
        the caller-side half of a following 1x1 conv (SubNetwork's
        ``fusion_i``), folded to quarter resolution with everything else.
        Only valid on the folded path."""
        c = self.in_channels
        f = self.scale_factor
        cf = self.layout == "NCHW"
        ax = 1 if cf else -1
        shuffle = pixel_shuffle_cf if cf else pixel_shuffle

        def upsample2(t):
            if cf:
                B, C_, H, W = t.shape
                return jax.image.resize(t, (B, C_, 2 * H, 2 * W), "linear")
            return resize_bilinear(t, scale=2.0)

        kw = dict(data_format=self.layout)
        if f == 2 and _fold_dual_upsample(x.dtype):
            # Algebraically folded serving form (identical parameters).
            # Everything after the PReLUs is LINEAR, and both upsamplings
            # commute with 1x1 convs: W2p(PS(p)) = PS(M p) with M the
            # PixelShuffle block-expansion of W2p, and W2b(bilin(b)) =
            # bilin(W2b b). Folding up_p_conv2/up_b_conv2/conv down to
            # QUARTER resolution removes three full-resolution HBM passes
            # per decoder level (traced at ~25 ms/iter on the L1->L0 level
            # of the serving pipeline); full-res work left: one shuffle
            # relayout + one bilinear + one add.
            p = Conv2d(2 * c, 1, padding=0, use_bias=False,
                       name="up_p_conv1", **kw)(x)
            p = PReLU(name="up_p_prelu")(p)
            b = Conv2d(c, 1, padding=0, name="up_b_conv1", **kw)(x)
            b = PReLU(name="up_b_prelu")(b)
            kp2, _ = Conv2dParams(c // 2, c // 2, 1, use_bias=False,
                                  name="up_p_conv2")()
            kb2, _ = Conv2dParams(c, c // 2, 1, use_bias=False,
                                  name="up_b_conv2")()
            kc, _ = Conv2dParams(c, c // 2, 1, use_bias=False, name="conv")()
            kp2 = kp2[0, 0].astype(jnp.float32)   # (c/2 in, c/2 out)
            kb2 = kb2[0, 0].astype(jnp.float32)   # (c, c/2)
            kc = kc[0, 0].astype(jnp.float32)     # (c, c/2): [xp | xb] rows
            a_p = kp2 @ kc[: c // 2]              # PS-path fold
            a_b = kb2 @ kc[c // 2:]               # bilinear-path fold
            if fold_tail is not None:
                ft = fold_tail.astype(jnp.float32)
                a_p = a_p @ ft
                a_b = a_b @ ft
            # expand a_p through PixelShuffle's (i, dy, dx) channel order:
            # q[..., o*4 + j] = sum_i a_p[i, o] * p[..., i*4 + j]
            eye4 = jnp.eye(4, dtype=jnp.float32)
            m = (a_p[:, None, :, None] * eye4[None, :, None, :]
                 ).reshape(2 * c, 2 * c)
            dt = x.dtype
            spec = "bchw,cd->bdhw" if cf else "bhwc,cd->bhwd"
            q = jnp.einsum(spec, p, m.astype(dt),
                           preferred_element_type=jnp.float32).astype(dt)
            v = jnp.einsum(spec, b, a_b.astype(dt),
                           preferred_element_type=jnp.float32).astype(dt)
            return shuffle(q, 2) + upsample2(v)
        assert fold_tail is None, "fold_tail requires the folded path"
        if f == 2:
            # pixel-shuffle path
            xp = Conv2d(2 * c, 1, padding=0, use_bias=False, name="up_p_conv1", **kw)(x)
            xp = PReLU(name="up_p_prelu")(xp)
            xp = shuffle(xp, 2)
            xp = Conv2d(c // 2, 1, padding=0, use_bias=False, name="up_p_conv2", **kw)(xp)
            # bilinear path
            xb = Conv2d(c, 1, padding=0, name="up_b_conv1", **kw)(x)
            xb = PReLU(name="up_b_prelu")(xb)
            xb = upsample2(xb)
            xb = Conv2d(c // 2, 1, padding=0, use_bias=False, name="up_b_conv2", **kw)(xb)
            out = Conv2d(c // 2, 1, padding=0, use_bias=False, name="conv", **kw)(
                jnp.concatenate([xp, xb], axis=ax)
            )
        elif f == 4:
            xp = Conv2d(16 * c, 1, padding=0, use_bias=False, name="up_p_conv1")(x)
            xp = PReLU(name="up_p_prelu")(xp)
            xp = pixel_shuffle(xp, 4)
            xp = Conv2d(c, 1, padding=0, use_bias=False, name="up_p_conv2")(xp)
            xb = Conv2d(c, 1, padding=0, name="up_b_conv1")(x)
            xb = PReLU(name="up_b_prelu")(xb)
            xb = resize_bilinear(xb, scale=4.0)
            xb = Conv2d(c, 1, padding=0, use_bias=False, name="up_b_conv2")(xb)
            out = Conv2d(c, 1, padding=0, use_bias=False, name="conv")(
                jnp.concatenate([xp, xb], axis=-1)
            )
        else:
            raise NotImplementedError(f"scale_factor={f}")
        return out


class LN2DLinear(nn.Module):
    """LayerNorm + zero-init 1x1 conv (UNet_arch.py:158-176)."""

    out_channels: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        x = LayerNorm2d(name="norm")(x)
        return Conv2d(self.out_channels, 1, padding=0, use_bias=self.use_bias,
                      kernel_init=inits.zeros, name="linear")(x)


class DB(nn.Module):
    """Dilated dense block (arch_util.py:326-350)."""

    in_channel: int
    d_list: Sequence[int] = (1, 2, 3, 2, 1)
    inter_num: int = 24

    @nn.compact
    def __call__(self, x):
        t = x
        for i, d in enumerate(self.d_list):
            # dilated conv + relu, dense concat
            _t = jax.lax.conv_general_dilated(
                t,
                self.param(
                    f"conv{i}_kernel", inits.torch_default_kernel,
                    (3, 3, t.shape[-1], self.inter_num),
                ).astype(t.dtype),
                window_strides=(1, 1),
                padding=((d, d), (d, d)),
                rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            _t = _t + self.param(
                f"conv{i}_bias", inits.torch_default_bias(9 * t.shape[-1]),
                (self.inter_num,),
            ).astype(t.dtype)
            _t = jax.nn.relu(_t)
            t = jnp.concatenate([_t, t], axis=-1)
        return Conv2d(self.in_channel, 1, padding=0, name="conv_post")(t)


class CSAF(nn.Module):
    """Cross-scale channel attention fusion (arch_util.py:301-323)."""

    in_chnls: int  # = 3 * branch channels
    ratio: int = 4

    @nn.compact
    def __call__(self, x0, x2, x4):
        sq = lambda t: jnp.mean(t, axis=(1, 2), keepdims=True)
        out = jnp.concatenate([sq(x0), sq(x2), sq(x4)], axis=-1)
        out = Conv2d(self.in_chnls // self.ratio, 1, padding=0, name="compress1")(out)
        out = jax.nn.relu(out)
        out = Conv2d(self.in_chnls // self.ratio, 1, padding=0, name="compress2")(out)
        out = jax.nn.relu(out)
        out = Conv2d(self.in_chnls, 1, padding=0, name="excitation")(out)
        out = jax.nn.sigmoid(out)
        w0, w2, w4 = jnp.split(out, 3, axis=-1)
        return x0 * w0 + x2 * w2 + x4 * w4


class ResidualBlockNoBN(nn.Module):
    """Residual block without BN (arch_util.py:67-95)."""

    num_feat: int = 64
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        identity = x
        out = Conv2d(self.num_feat, 3, padding=1, name="conv1")(x)
        out = jax.nn.relu(out)
        out = Conv2d(self.num_feat, 3, padding=1, name="conv2")(out)
        return identity + out * self.res_scale


class Upsample(nn.Module):
    """Pixel-shuffle upsampler for scale 2^n / 3 (arch_util.py:98-118)."""

    scale: int
    num_feat: int

    @nn.compact
    def __call__(self, x):
        import math

        if (self.scale & (self.scale - 1)) == 0:
            for i in range(int(math.log2(self.scale))):
                x = Conv2d(4 * self.num_feat, 3, padding=1, name=f"conv_{i}")(x)
                x = pixel_shuffle(x, 2)
        elif self.scale == 3:
            x = Conv2d(9 * self.num_feat, 3, padding=1, name="conv_0")(x)
            x = pixel_shuffle(x, 3)
        else:
            raise ValueError(f"scale {self.scale} is not supported")
        return x


def flow_warp(x: jax.Array, flow: jax.Array, padding_mode: str = "zeros") -> jax.Array:
    """Warp NHWC x by optical flow (B, H, W, 2) (arch_util.py:121-156)."""
    from ..ops.legacy import _bilinear_gather

    B, H, W, C = x.shape
    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=flow.dtype),
                          jnp.arange(W, dtype=flow.dtype), indexing="ij")
    ys = (gy[None] + flow[..., 1]).reshape(B, H * W)
    xs = (gx[None] + flow[..., 0]).reshape(B, H * W)
    out = _bilinear_gather(x, ys, xs)
    return out.reshape(B, H, W, C)


class DCNv2Pack(nn.Module):
    """Modulated deformable conv with self-generated offsets
    (arch_util.py:232-273, EDVR-era)."""

    out_channels: int
    kernel_size: int = 3
    deform_groups: int = 1

    @nn.compact
    def __call__(self, x, feat):
        from ..ops.legacy import modulated_deform_conv2d

        k = self.kernel_size
        out = Conv2d(self.deform_groups * 3 * k * k, k, padding=k // 2,
                     kernel_init=inits.zeros, bias_init=inits.zeros,
                     name="conv_offset")(feat)
        o1, o2, mask = jnp.split(out, 3, axis=-1)
        # interleave (dy, dx) pairs per tap
        offset = jnp.stack([o1, o2], axis=-1).reshape(
            *o1.shape[:-1], 2 * o1.shape[-1]
        )
        mask = jax.nn.sigmoid(mask)
        in_ch = x.shape[-1]
        weight = self.param("kernel", inits.torch_default_kernel,
                            (k, k, in_ch, self.out_channels))
        bias = self.param("bias", inits.torch_default_bias(in_ch * k * k),
                          (self.out_channels,))
        return modulated_deform_conv2d(
            x, offset, mask, weight, bias, stride=1, padding=k // 2,
            deform_groups=self.deform_groups,
        )


class CrossFusionBlock(nn.Module):
    """x_tgt + gate * 1x1(x_src) (DecompModel_arch.py:57-66)."""

    in_channels: int

    @nn.compact
    def __call__(self, x_src, x_tgt):
        gate = self.param("gate", inits.ones, (self.in_channels,))
        return x_tgt + gate.astype(x_tgt.dtype) * Conv2d(
            self.in_channels, 1, padding=0, name="transform"
        )(x_src)


class SEBlock(nn.Module):
    """Squeeze-excitation channel attention (DecompModel_arch.py:68-84)."""

    channel: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = Conv2d(self.channel // self.reduction, 1, padding=0, use_bias=False,
                   name="fc1")(y)
        y = jax.nn.relu(y)
        y = Conv2d(self.channel, 1, padding=0, use_bias=False, name="fc2")(y)
        return x * jax.nn.sigmoid(y)


class SpatialAttention(nn.Module):
    """Mean/max-pool spatial attention (DecompModel_arch.py:86-99)."""

    kernel_size: int = 7

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        attn = Conv2d(1, self.kernel_size, padding=self.kernel_size // 2,
                      use_bias=False, name="conv")(
            jnp.concatenate([avg, mx], axis=-1)
        )
        return x * jax.nn.sigmoid(attn)


class SAM(nn.Module):
    """Multi-scale dilated dense attention (arch_util.py:353-380)."""

    in_channel: int
    d_list: Sequence[int] = (1, 2, 3, 2, 1)
    inter_num: int = 24

    @nn.compact
    def __call__(self, x):
        x2 = resize_bilinear(x, scale=0.5)
        x4 = resize_bilinear(x, scale=0.25)
        y0 = DB(self.in_channel, self.d_list, self.inter_num, name="basic_block")(x)
        y2 = DB(self.in_channel, self.d_list, self.inter_num, name="basic_block_2")(x2)
        y4 = DB(self.in_channel, self.d_list, self.inter_num, name="basic_block_4")(x4)
        y2 = resize_bilinear(y2, size=(x.shape[1], x.shape[2]))
        y4 = resize_bilinear(y4, size=(x.shape[1], x.shape[2]))
        y = CSAF(3 * self.in_channel, name="fusion")(y0, y2, y4)
        return x + y
