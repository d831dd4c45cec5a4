"""QD quaternion Retinex decomposition networks (model1..model4).

Parity: basicsr/QD/model{1,2,3,4}.py. One flax module parameterized by
``model_type`` covers all four variants:

- model1: plain conv branches + symmetric C-x-C cross-attention (model1.py:124).
- model2: dilated second branch convs; attention projections kaiming-init
  (model2.py:154-196).
- model3: extra mini U-Net (stride-2 down conv, mid conv, transposed-conv up
  with skip) before the branches (model3.py Decomp), attention dropout 0.1.
- model4: model1 + PostSmooth residual depthwise smoothing of Q1/Q2 after
  IWT (model4.py:157-260).

``__call__(img)`` -> (Q1, Q2) quaternion maps (B, H, W, 4) channels-last.
``wavelet_features(img)`` -> (Q1_w, Q2_w) 16-channel wavelet-domain features
at H/2 x W/2 — the "stop before IWT" forward the Wavelet Decomp arch uses
(DecompDualBranchDDWavelet_arch.py:80-132, de-interleave indices :120-127).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import init as inits
from ..nn.layers import Conv2d, ConvTranspose2d
from ..ops.quaternion import rgb_to_quaternions
from ..ops.wavelet import dwt2, iwt2

# wavelet-domain de-interleave: 4 subbands x 8 interleaved (Q1,Q2) components
Q1_W_INDICES = tuple(s * 8 + c for s in range(4) for c in (0, 2, 4, 6))
Q2_W_INDICES = tuple(s * 8 + c for s in range(4) for c in (1, 3, 5, 7))


def _laplacian_init(out_channels):
    """Sharpening conv init: Laplacian broadcast over all channel pairs / C
    (model1.py:162-169)."""

    def init(key, shape, dtype=jnp.float32):
        # shape HWIO = (3, 3, out_channels, out_channels)
        lap = jnp.asarray([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], dtype) / out_channels
        return jnp.broadcast_to(lap[:, :, None, None], shape).astype(dtype)

    return init


class SymmetricCrossAttention(nn.Module):
    """Channel-wise C x C cross attention, both directions (model1.py:53-121)."""

    dim: int
    heads: int = 1
    dropout: float = 0.0
    kaiming_proj: bool = False  # model2 inits projections kaiming-normal

    @nn.compact
    def __call__(self, q1_feat: jax.Array, q2_feat: jax.Array):
        B, H, W, C = q1_feat.shape
        L = H * W
        hd = C // self.heads
        kinit = (
            inits.kaiming_normal(mode="fan_in", nonlinearity="linear")
            if self.kaiming_proj
            else inits.torch_default_kernel
        )

        def proj(name):
            return Conv2d(C, 1, padding=0, kernel_init=kinit,
                          bias_init=inits.zeros if self.kaiming_proj else None,
                          name=name)

        q1 = proj("q1_proj")(q1_feat)
        k2 = proj("k2_proj")(q2_feat)
        v2 = proj("v2_proj")(q2_feat)
        q2 = proj("q2_proj")(q2_feat)
        k1 = proj("k1_proj")(q1_feat)
        v1 = proj("v1_proj")(q1_feat)

        def heads_first(x):  # (B, H, W, C) -> (B, heads, hd, L)
            return x.reshape(B, L, self.heads, hd).transpose(0, 2, 3, 1)

        q1, k2, v2, q2, k1, v1 = map(heads_first, (q1, k2, v2, q2, k1, v1))
        scale = hd**-0.5

        def attend(q, k, v):
            attn = jax.nn.softmax(
                jnp.einsum("bhcl,bhdl->bhcd", q * scale, k,
                           preferred_element_type=jnp.float32),
                axis=-1,
            ).astype(q.dtype)
            if self.dropout > 0 and self.has_rng("dropout"):
                keep = 1.0 - self.dropout
                attn = jnp.where(
                    jax.random.bernoulli(self.make_rng("dropout"), keep, attn.shape),
                    attn / keep, 0.0,
                )
            return jnp.einsum("bhcd,bhdl->bhcl", attn, v,
                              preferred_element_type=jnp.float32).astype(q.dtype)

        cross1 = attend(q1, k2, v2)
        cross2 = attend(q2, k1, v1)

        def heads_back(x):  # (B, heads, hd, L) -> (B, H, W, C)
            return x.transpose(0, 3, 1, 2).reshape(B, H, W, C)

        refined1 = proj("out1")(heads_back(cross1)) + q1_feat
        refined2 = proj("out2")(heads_back(cross2)) + q2_feat
        return refined1, refined2


class _Branch(nn.Module):
    """conv-relu-conv refinement branch; model2 dilates the 2nd conv."""

    num_filters: int
    dilated: bool = False

    @nn.compact
    def __call__(self, x):
        nf = self.num_filters
        x = Conv2d(nf, 3, padding=1, name="conv0")(x)
        x = jax.nn.relu(x)
        if self.dilated:
            kernel = self.param("conv1_kernel", inits.torch_default_kernel,
                                (3, 3, nf, nf))
            bias = self.param("conv1_bias", inits.torch_default_bias(9 * nf), (nf,))
            x = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), (1, 1), ((2, 2), (2, 2)),
                rhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias.astype(x.dtype)
        else:
            x = Conv2d(nf, 3, padding=1, name="conv1")(x)
        return x


class PostSmooth(nn.Module):
    """Residual depthwise smoothing (model4.py:157-165)."""

    channels: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        y = Conv2d(self.channels, self.kernel_size,
                   padding=self.kernel_size // 2, groups=self.channels,
                   name="conv")(x)
        return x + jax.nn.relu(y)


class Decomp(nn.Module):
    model_type: str = "model4"
    inp_channels: int = 8
    out_channels: int = 8
    use_wavelets: bool = True
    num_filters: int = 32

    def setup(self):
        nf = self.num_filters
        out_ch = self.out_channels * (4 if self.use_wavelets else 1)
        self.conv_in = Conv2d(nf, 3, padding=1, name="conv_in")
        if self.model_type == "model3":
            self.down_conv = Conv2d(nf, 3, strides=2, padding=1, name="down_conv")
            self.mid_conv = Conv2d(nf, 3, padding=1, name="mid_conv")
            self.up_conv = ConvTranspose2d(nf, 2, 2, name="up_conv")
        dilated = self.model_type == "model2"
        self.branch_q1 = _Branch(nf, dilated, name="branch_q1")
        self.branch_q2 = _Branch(nf, dilated, name="branch_q2")
        self.cross_attn = SymmetricCrossAttention(
            nf,
            dropout=0.1 if self.model_type == "model3" else 0.0,
            kaiming_proj=self.model_type == "model2",
            name="cross_attn",
        )
        self.fuse = Conv2d(nf, 1, padding=0, name="fuse")
        self.conv_out = Conv2d(out_ch, 3, padding=1, name="conv_out")
        self.sharpening = Conv2d(out_ch, 3, padding=1,
                                 kernel_init=_laplacian_init(out_ch),
                                 bias_init=inits.zeros, name="sharpening")
        if self.model_type == "model4":
            self.smooth_q1 = PostSmooth(4, 3, name="smooth_q1")
            self.smooth_q2 = PostSmooth(4, 3, name="smooth_q2")

    def _trunk(self, input_tensor):
        """Shared path between quaternion encoding and the IWT."""
        feat = self.conv_in(input_tensor)
        if self.model_type == "model3":
            down = jax.nn.relu(self.down_conv(feat))
            mid = jax.nn.relu(self.mid_conv(down))
            feat = feat + self.up_conv(mid)
        q1_feat = self.branch_q1(feat) + feat
        q2_feat = self.branch_q2(feat) + feat
        q1_feat, q2_feat = self.cross_attn(q1_feat, q2_feat)
        fused = self.fuse(jnp.concatenate([q1_feat, q2_feat], axis=-1))
        out = self.conv_out(fused)
        return out + self.sharpening(out)

    def __call__(self, inp_img: jax.Array):
        """RGB (B, H, W, 3) -> (Q1, Q2) each (B, H, W, 4)."""
        x = rgb_to_quaternions(inp_img)
        if self.use_wavelets:
            x = dwt2(x)
        out = self._trunk(x)
        if self.use_wavelets:
            out = iwt2(out)
        q1 = out[..., (0, 2, 4, 6)]
        q2 = out[..., (1, 3, 5, 7)]
        if self.model_type == "model4":
            q1 = self.smooth_q1(q1)
            q2 = self.smooth_q2(q2)
        return q1, q2

    def wavelet_features(self, inp_img: jax.Array):
        """Stop-before-IWT forward: (B, H, W, 3) -> (Q1_w, Q2_w) each
        (B, H/2, W/2, 16). No PostSmooth (the Wavelet arch deletes it,
        DecompDualBranchDDWavelet_arch.py:71-78)."""
        assert self.use_wavelets
        x = dwt2(rgb_to_quaternions(inp_img))
        out = self._trunk(x)
        return out[..., Q1_W_INDICES], out[..., Q2_W_INDICES]
