"""RetinexFormer baseline (reference: analysis/model_zoo/RetinexFormer.py)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn.layers import Conv2d, ConvTranspose2d, Dense
from .common import LayerNormLast


def _gelu_exact(x):
    # torch nn.GELU default is the exact erf form; jax.nn.gelu
    # defaults to the tanh approximation (a ~1e-3 systematic
    # parity error that compounds over deep stacks)
    import jax
    return jax.nn.gelu(x, approximate=False)


class IlluminationEstimator(nn.Module):
    """RetinexFormer.py:92-116."""

    n_fea_middle: int
    n_fea_in: int = 4
    n_fea_out: int = 3

    @nn.compact
    def __call__(self, img):
        mean_c = jnp.mean(img, axis=-1, keepdims=True)
        inp = jnp.concatenate([img, mean_c], axis=-1)
        x1 = Conv2d(self.n_fea_middle, 1, padding=0, name="conv1")(inp)
        illu_fea = Conv2d(self.n_fea_middle, 5, padding=2,
                          groups=self.n_fea_in, name="depth_conv")(x1)
        illu_map = Conv2d(self.n_fea_out, 1, padding=0, name="conv2")(illu_fea)
        return illu_fea, illu_map


class IGMSA(nn.Module):
    """Illumination-guided transposed (channel-wise) attention
    (RetinexFormer.py:120-180)."""

    dim: int
    dim_head: int = 64
    heads: int = 8

    @nn.compact
    def __call__(self, x_in, illu_fea):
        b, h, w, c = x_in.shape
        n = h * w
        dh = self.dim_head * self.heads
        x = x_in.reshape(b, n, c)
        q = Dense(dh, use_bias=False, name="to_q")(x)
        k = Dense(dh, use_bias=False, name="to_k")(x)
        v = Dense(dh, use_bias=False, name="to_v")(x)
        illu = illu_fea.reshape(b, n, dh)

        def heads_split(t):  # (b, n, h*d) -> (b, heads, n, d)
            return jnp.moveaxis(t.reshape(b, n, self.heads, self.dim_head), 2, 1)

        q, k, vh, illu_h = map(heads_split, (q, k, v, illu))
        vh = vh * illu_h
        # transpose attention over channel dim (q/k/v -> (b, heads, d, n))
        q = jnp.swapaxes(q, -2, -1)
        k = jnp.swapaxes(k, -2, -1)
        vh = jnp.swapaxes(vh, -2, -1)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        attn = jnp.einsum("bhdn,bhen->bhde", k, q)
        rescale = self.param("rescale", lambda key: jnp.ones((self.heads, 1, 1)))
        attn = jax.nn.softmax(attn * rescale, axis=-1)
        out = jnp.einsum("bhde,bhen->bhdn", jnp.swapaxes(attn, -2, -1), vh)
        # (b, heads, d, n) -> (b, n, heads*d)
        out = jnp.transpose(out, (0, 3, 1, 2)).reshape(b, n, dh)
        out_c = Dense(self.dim, use_bias=True, name="proj")(out).reshape(b, h, w, c)
        # positional branch on v
        vp = v.reshape(b, h, w, dh)
        vp = Conv2d(self.dim, 3, padding=1, groups=self.dim, use_bias=False,
                    name="pos1")(vp)
        vp = _gelu_exact(vp)
        vp = Conv2d(self.dim, 3, padding=1, groups=self.dim, use_bias=False,
                    name="pos2")(vp)
        return out_c + vp


class FeedForward(nn.Module):
    """RetinexFormer.py:183-194."""

    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        h = self.dim * self.mult
        x = Conv2d(h, 1, padding=0, use_bias=False, name="fc1")(x)
        x = _gelu_exact(x)
        x = Conv2d(h, 3, padding=1, groups=h, use_bias=False, name="dw")(x)
        x = _gelu_exact(x)
        return Conv2d(self.dim, 1, padding=0, use_bias=False, name="fc2")(x)


class IGAB(nn.Module):
    """RetinexFormer.py:197-224."""

    dim: int
    dim_head: int
    heads: int
    num_blocks: int

    @nn.compact
    def __call__(self, x, illu_fea):
        for i in range(self.num_blocks):
            x = IGMSA(self.dim, self.dim_head, self.heads,
                      name=f"attn_{i}")(x, illu_fea) + x
            y = LayerNormLast(name=f"norm_{i}")(x)
            x = FeedForward(self.dim, name=f"ff_{i}")(y) + x
        return x


class Denoiser(nn.Module):
    """RetinexFormer.py:227-299."""

    in_dim: int = 3
    out_dim: int = 3
    dim: int = 31
    level: int = 2
    num_blocks: Sequence[int] = (2, 4, 4)

    @nn.compact
    def __call__(self, x, illu_fea):
        fea = Conv2d(self.dim, 3, padding=1, use_bias=False, name="embedding")(x)
        d = self.dim
        encs, illus = [], []
        for i in range(self.level):
            fea = IGAB(d, self.dim, d // self.dim, self.num_blocks[i],
                       name=f"enc_igab_{i}")(fea, illu_fea)
            encs.append(fea)
            illus.append(illu_fea)
            fea = Conv2d(d * 2, 4, strides=2, padding=1, use_bias=False,
                         name=f"enc_down_{i}")(fea)
            illu_fea = Conv2d(d * 2, 4, strides=2, padding=1, use_bias=False,
                              name=f"enc_illu_down_{i}")(illu_fea)
            d *= 2
        fea = IGAB(d, self.dim, d // self.dim, self.num_blocks[-1],
                   name="bottleneck")(fea, illu_fea)
        for i in range(self.level):
            fea = ConvTranspose2d(d // 2, kernel_size=2, strides=2,
                                  name=f"dec_up_{i}")(fea)
            fea = Conv2d(d // 2, 1, padding=0, use_bias=False,
                         name=f"dec_fuse_{i}")(
                jnp.concatenate([fea, encs[self.level - 1 - i]], axis=-1))
            illu_fea = illus[self.level - 1 - i]
            fea = IGAB(d // 2, self.dim, (d // 2) // self.dim,
                       self.num_blocks[self.level - 1 - i],
                       name=f"dec_igab_{i}")(fea, illu_fea)
            d //= 2
        return Conv2d(self.out_dim, 3, padding=1, use_bias=False,
                      name="mapping")(fea) + x


class RetinexFormer(nn.Module):
    """RetinexFormer.py:302-360 (single-stage config: n_feat=40, stage=1)."""

    in_channels: int = 3
    out_channels: int = 3
    n_feat: int = 31
    stage: int = 3
    num_blocks: Sequence[int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x):
        for s in range(self.stage):
            illu_fea, illu_map = IlluminationEstimator(
                self.n_feat, name=f"estimator_{s}")(x)
            inp = x * illu_map + x
            x = Denoiser(self.in_channels, self.out_channels, self.n_feat,
                         2, self.num_blocks, name=f"denoiser_{s}")(inp, illu_fea)
        return x


def buildRetinexFormer():
    return RetinexFormer(in_channels=3, out_channels=3, n_feat=40, stage=1,
                         num_blocks=(1, 2, 2))
