"""LLFormer baseline (reference: analysis/model_zoo/LLFormer.py)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn.layers import Conv2d, pixel_shuffle, pixel_unshuffle
from .common import LayerNormLast


def _gelu_exact(x):
    # torch nn.GELU default is the exact erf form; jax.nn.gelu
    # defaults to the tanh approximation (a ~1e-3 systematic
    # parity error that compounds over deep stacks)
    import jax
    return jax.nn.gelu(x, approximate=False)


def _l2norm(t, axis=-1):
    return t / jnp.maximum(jnp.linalg.norm(t, axis=axis, keepdims=True), 1e-12)


class NextAttentionImplZ(nn.Module):
    """Axis-based MSA over rows (LLFormer.py:74-105). NHWC."""

    num_dims: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        nh, dh = self.num_heads, c // self.num_heads
        qkv = Conv2d(c * 3, 1, padding=0, name="q1")(x)
        qkv = Conv2d(c * 3, 3, padding=1, groups=c * 3, name="q2")(qkv)
        qkv = Conv2d(c * 3, 3, padding=1, groups=c * 3, name="q3")(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def reshape(t):  # (n, h, w, nh*dh) -> (n*nh*h, w, dh)
            t = t.reshape(n, h, w, nh, dh)
            return jnp.transpose(t, (0, 3, 1, 2, 4)).reshape(n * nh * h, w, dh)

        q, k, v = map(reshape, (q, k, v))
        q = _l2norm(q)
        k = _l2norm(k)
        fac = self.param("fac", lambda key: jnp.ones((1,)))
        att = jnp.einsum("bwd,bvd->bwv", q, k) * fac
        att = jax.nn.softmax(att, axis=-1)
        res = jnp.einsum("bwv,bvd->bwd", att, v)
        res = res.reshape(n, nh, h, w, dh)
        res = jnp.transpose(res, (0, 2, 3, 1, 4)).reshape(n, h, w, c)
        return Conv2d(c, 1, padding=0, name="fin")(res)


class NextAttentionZ(nn.Module):
    """Row then column axis attention (LLFormer.py:108-126)."""

    num_dims: int
    num_heads: int = 1

    @nn.compact
    def __call__(self, x):
        x = NextAttentionImplZ(self.num_dims, self.num_heads, name="row_att")(x)
        x = jnp.swapaxes(x, 1, 2)
        x = NextAttentionImplZ(self.num_dims, self.num_heads, name="col_att")(x)
        return jnp.swapaxes(x, 1, 2)


class DualGatedFFN(nn.Module):
    """LLFormer.py:129-146."""

    dim: int
    expansion: float
    use_bias: bool

    @nn.compact
    def __call__(self, x):
        h = int(self.dim * self.expansion)
        x = Conv2d(h * 2, 1, padding=0, use_bias=self.use_bias,
                   name="project_in")(x)
        x = Conv2d(h * 2, 3, padding=1, groups=h * 2, use_bias=self.use_bias,
                   name="dwconv")(x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        x = _gelu_exact(x2) * x1 + _gelu_exact(x1) * x2
        return Conv2d(self.dim, 1, padding=0, use_bias=self.use_bias,
                      name="project_out")(x)


class TransformerBlock(nn.Module):
    """LLFormer.py:149-163. Attention convs keep torch-default bias=True
    (the reference constructor ignores its bias arg for NextAttentionZ)."""

    dim: int
    num_heads: int = 1
    expansion: float = 2.66
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        y = LayerNormLast(name="norm1")(x)
        x = x + NextAttentionZ(self.dim, self.num_heads, name="attn")(y)
        y = LayerNormLast(name="norm2")(x)
        return x + DualGatedFFN(self.dim, self.expansion, self.use_bias,
                                name="ffn")(y)


class LAMModuleV2(nn.Module):
    """Cross-layer attention fusion (LLFormer.py:211-252). Input is a list
    of N same-shaped NHWC maps."""

    in_dim: int

    @nn.compact
    def __call__(self, feats):
        n_layers = len(feats)
        b, h, w, c = feats[0].shape
        x = jnp.concatenate(feats, axis=-1)  # (B, H, W, N*C)
        qkv = Conv2d(self.in_dim * 3, 1, padding=0, name="qkv")(x)
        qkv = Conv2d(self.in_dim * 3, 3, padding=1, groups=self.in_dim * 3,
                     name="qkv_dwconv")(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def flat(t):  # (B, H, W, N*C) -> (B, N, C*H*W)
            t = t.reshape(b, h, w, n_layers, c)
            return jnp.transpose(t, (0, 3, 4, 1, 2)).reshape(b, n_layers, -1)

        q, k, v = map(flat, (q, k, v))
        q = _l2norm(q)
        k = _l2norm(k)
        temp = self.param("temperature", lambda key: jnp.ones((1,)))
        att = jax.nn.softmax(jnp.einsum("bnd,bmd->bnm", q, k) * temp, axis=-1)
        out = jnp.einsum("bnm,bmd->bnd", att, v)
        out = jnp.transpose(out.reshape(b, n_layers, c, h, w), (0, 3, 4, 1, 2))
        out = out.reshape(b, h, w, n_layers * c)
        out = Conv2d(self.in_dim, 1, padding=0, name="project_out")(out)
        return out + x


class Downsample(nn.Module):
    n_feat: int

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.n_feat // 2, 3, padding=1, use_bias=False,
                   name="conv")(x)
        return pixel_unshuffle(x, 2)


class Upsample(nn.Module):
    n_feat: int

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.n_feat * 2, 3, padding=1, use_bias=False,
                   name="conv")(x)
        return pixel_shuffle(x, 2)


class LLFormer(nn.Module):
    """LLFormer.py:256-416; comparison config dim=16, blocks [2,4,8,16]."""

    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 16
    num_blocks: Sequence[int] = (2, 4, 8, 16)
    num_refinement_blocks: int = 2
    heads: Sequence[int] = (1, 2, 4, 8)
    expansion: float = 2.66
    use_bias: bool = False
    attention: bool = True
    skip: bool = False

    def _blocks(self, dim, heads, n, name):
        return [TransformerBlock(dim, heads, self.expansion, self.use_bias,
                                 name=f"{name}_{i}") for i in range(n)]

    @nn.compact
    def __call__(self, inp_img):
        d = self.dim
        nb, heads = self.num_blocks, self.heads
        # unused in forward but present in the reference param count
        self.param("coefficient", lambda k: jnp.ones((4, 2, d * 8)))

        x = Conv2d(d, 3, padding=1, use_bias=False, name="patch_embed")(inp_img)
        e1 = x
        for blk in self._blocks(d, heads[0], nb[0], "encoder_1"):
            e1 = blk(e1)
        e2 = e1
        for blk in self._blocks(d, heads[0], nb[0], "encoder_2"):
            e2 = blk(e2)
        e3 = e2
        for blk in self._blocks(d, heads[0], nb[0], "encoder_3"):
            e3 = blk(e3)
        fused = LAMModuleV2(d * 3, name="layer_fussion")([e1, e2, e3])
        fused = Conv2d(d, 1, padding=0, use_bias=self.use_bias,
                       name="conv_fuss")(fused)

        x10 = Downsample(d, name="down_1")(fused)
        for blk in self._blocks(d * 2, heads[1], nb[0], "dec1_0"):
            x10 = blk(x10)
        x20 = Downsample(d * 2, name="down_2")(x10)
        for blk in self._blocks(d * 4, heads[2], nb[1], "dec2_0"):
            x20 = blk(x20)
        x30 = Downsample(d * 4, name="down_3")(x20)
        for blk in self._blocks(d * 8, heads[3], nb[2], "dec3_0"):
            x30 = blk(x30)
        x40 = Downsample(d * 8, name="down_4")(x30)
        for blk in self._blocks(d * 16, heads[3], nb[3], "dec4"):
            x40 = blk(x40)
        x40 = Upsample(d * 16, name="up4_3")(x40)

        c43 = self.param("coefficient_4_3", lambda k: jnp.ones((2, d * 8)))
        x31 = c43[0] * x30 + c43[1] * x40
        x31 = Conv2d(d * 8, 1, padding=0, use_bias=self.use_bias,
                     name="skip_4_3")(x31)
        for blk in self._blocks(d * 8, heads[3], nb[2], "dec3_1"):
            x31 = blk(x31)
        x31 = Upsample(d * 8, name="up3_2")(x31)

        c32 = self.param("coefficient_3_2", lambda k: jnp.ones((2, d * 4)))
        x21 = c32[0] * x20 + c32[1] * x31
        x21 = Conv2d(d * 4, 1, padding=0, use_bias=self.use_bias,
                     name="skip_3_2")(x21)
        for blk in self._blocks(d * 4, heads[2], nb[1], "dec2_1"):
            x21 = blk(x21)
        x21 = Upsample(d * 4, name="up2_1")(x21)

        # skip_2_1 is declared by the reference but never used in its forward
        # (LLFormer.py:323 vs :394) — create matching params for count parity
        self.param("skip_2_1_kernel", lambda k: jnp.zeros((1, 1, d * 2, d * 2)))

        c21 = self.param("coefficient_2_1", lambda k: jnp.ones((2, d * 2)))
        x11 = c21[0] * x10 + c21[1] * x21
        x11 = Conv2d(d * 2, 1, padding=0, use_bias=self.use_bias,
                     name="skip_1_0")(x11)
        for blk in self._blocks(d * 2, heads[1], nb[0], "dec1_1"):
            x11 = blk(x11)
        x11 = Upsample(d * 2, name="up2_0")(x11)

        latent = fused
        for blk in self._blocks(d, heads[0], nb[0], "latent"):
            latent = blk(latent)
        c10 = self.param("coefficient_1_0", lambda k: jnp.ones((2, d)))
        out = c10[0] * latent + c10[1] * x11

        o1 = out
        for blk in self._blocks(d, heads[0], self.num_refinement_blocks, "ref1"):
            o1 = blk(o1)
        o2 = o1
        for blk in self._blocks(d, heads[0], self.num_refinement_blocks, "ref2"):
            o2 = blk(o2)
        o3 = o2
        for blk in self._blocks(d, heads[0], self.num_refinement_blocks, "ref3"):
            o3 = blk(o3)
        fused2 = LAMModuleV2(d * 3, name="layer_fussion_2")([o1, o2, o3])
        out = Conv2d(d, 1, padding=0, use_bias=self.use_bias,
                     name="conv_fuss_2")(fused2)
        out = Conv2d(self.out_channels, 3, padding=1, use_bias=self.use_bias,
                     name="output")(out)
        return out + inp_img if self.skip else out


def buildLLFormer():
    return LLFormer(inp_channels=3, out_channels=3, dim=16,
                    num_blocks=(2, 4, 8, 16), num_refinement_blocks=2,
                    heads=(1, 2, 4, 8), expansion=2.66, use_bias=False,
                    attention=True, skip=False)
