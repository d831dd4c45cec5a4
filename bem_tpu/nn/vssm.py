"""VSSM — the VMamba image classifier / backbone.

Parity: basicsr/vmamba/models/vmamba.py — VSSM:1380-1702 (patch-embed v1/v2,
downsample v1/v2/v3, stages of VSSBlocks, classifier head), Backbone_VSSM:
1704-1758 (out_indices feature pyramid), tiny/small/base factories:1761-1930.
Channels-last NHWC throughout (the reference's channel_first flag is a torch
layout concern that doesn't exist here).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import init as inits
from .layers import Conv2d, Dense, DropPath, LayerNorm2d
from .vss import VSSBlock


def _gelu_exact(x):
    # torch nn.GELU default is the exact erf form; jax.nn.gelu
    # defaults to the tanh approximation (a ~1e-3 systematic
    # parity error that compounds over deep stacks)
    import jax
    return jax.nn.gelu(x, approximate=False)


class PatchMerging2D(nn.Module):
    """2x2 space-to-channel + LN + linear reduction (vmamba.py:66-104)."""

    dim: int
    out_dim: int = -1

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = LayerNorm2d(name="norm")(x)
        out = self.out_dim if self.out_dim > 0 else 2 * self.dim
        return Dense(out, use_bias=False, name="reduction")(x)


class VSSM(nn.Module):
    patch_size: int = 4
    in_chans: int = 3
    num_classes: int = 1000
    depths: Sequence[int] = (2, 2, 9, 2)
    dims: Any = (96, 192, 384, 768)
    ssm_d_state: int = 16
    ssm_ratio: float = 2.0
    ssm_dt_rank: Any = "auto"
    ssm_conv: int = 3
    ssm_conv_bias: bool = True
    ssm_drop_rate: float = 0.0
    ssm_init: str = "v0"
    forward_type: str = "v05_noz"
    mlp_ratio: float = 4.0
    mlp_drop_rate: float = 0.0
    gmlp: bool = False
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    downsample_version: str = "v2"
    patchembed_version: str = "v1"
    posembed: bool = False
    imgsize: int = 224
    scan_backend: Optional[str] = None

    def _dims(self):
        if isinstance(self.dims, int):
            return [self.dims * 2**i for i in range(len(self.depths))]
        return list(self.dims)

    def _patch_embed(self, x):
        dims = self._dims()
        if self.patchembed_version == "v1":
            x = Conv2d(dims[0], self.patch_size, strides=self.patch_size,
                       padding=0, name="patch_embed")(x)
            if self.patch_norm:
                x = LayerNorm2d(name="patch_norm")(x)
        else:  # v2: two stride-/2 convs with GELU (vmamba.py:1536-1550)
            stride = self.patch_size // 2
            k = stride + 1
            x = Conv2d(dims[0] // 2, k, strides=stride, padding=1,
                       name="patch_embed_1")(x)
            if self.patch_norm:
                x = LayerNorm2d(name="patch_norm_1")(x)
            x = _gelu_exact(x)
            x = Conv2d(dims[0], k, strides=stride, padding=1,
                       name="patch_embed_2")(x)
            if self.patch_norm:
                x = LayerNorm2d(name="patch_norm_2")(x)
        return x

    def _downsample(self, x, dim, out_dim, i):
        v = self.downsample_version
        if v == "v1":
            return PatchMerging2D(dim, out_dim, name=f"downsample_{i}")(x)
        if v == "v2":
            x = Conv2d(out_dim, 2, strides=2, padding=0, name=f"downsample_{i}")(x)
            return LayerNorm2d(name=f"downsample_norm_{i}")(x)
        if v == "v3":
            x = Conv2d(out_dim, 3, strides=2, padding=1, name=f"downsample_{i}")(x)
            return LayerNorm2d(name=f"downsample_norm_{i}")(x)
        if v == "none":
            return x
        raise ValueError(v)

    def _stages(self, x, collect: bool = False):
        dims = self._dims()
        depths = list(self.depths)
        total = sum(depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        feats = []
        blk = 0
        for i, depth in enumerate(depths):
            for d in range(depth):
                x = VSSBlock(
                    hidden_dim=dims[i],
                    drop_path=dpr[blk],
                    ssm_d_state=self.ssm_d_state,
                    ssm_ratio=self.ssm_ratio,
                    ssm_dt_rank=self.ssm_dt_rank,
                    ssm_conv=self.ssm_conv,
                    ssm_conv_bias=self.ssm_conv_bias,
                    ssm_drop_rate=self.ssm_drop_rate,
                    ssm_init=self.ssm_init,
                    forward_type=self.forward_type,
                    mlp_ratio=self.mlp_ratio,
                    mlp_drop_rate=self.mlp_drop_rate,
                    mlp_type="gmlp" if self.gmlp else "mlp",
                    scan_backend=self.scan_backend,
                    name=f"layer{i}_block{d}",
                )(x)
                blk += 1
            if collect:
                feats.append(x)
            if i < len(depths) - 1:
                x = self._downsample(x, dims[i], dims[i + 1], i)
        return (x, feats) if collect else (x, None)

    @nn.compact
    def __call__(self, x):
        x = self._patch_embed(x)
        if self.posembed:
            ph = self.imgsize // self.patch_size
            pe = self.param("pos_embed", inits.trunc_normal(0.02),
                            (1, ph, ph, self._dims()[0]))
            x = x + pe.astype(x.dtype)
        x, _ = self._stages(x)
        x = LayerNorm2d(name="classifier_norm")(x)
        x = jnp.mean(x, axis=(1, 2))
        return Dense(self.num_classes, kernel_init=inits.trunc_normal(0.02),
                     bias_init=inits.zeros, name="head")(x)


class BackboneVSSM(VSSM):
    """Feature-pyramid variant (vmamba.py:1704-1758)."""

    out_indices: Tuple[int, ...] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, x):
        x = self._patch_embed(x)
        x, feats = self._stages(x, collect=True)
        outs = []
        for i in self.out_indices:
            outs.append(LayerNorm2d(name=f"outnorm{i}")(feats[i]))
        return outs


def vmamba_tiny(**kw):
    return VSSM(depths=(2, 2, 5, 2), dims=96, ssm_d_state=1, ssm_ratio=2.0,
                ssm_conv_bias=False, forward_type="v05_noz", mlp_ratio=4.0,
                downsample_version="v3", patchembed_version="v2", **kw)


def vmamba_small(**kw):
    return VSSM(depths=(2, 2, 15, 2), dims=96, ssm_d_state=1, ssm_ratio=2.0,
                ssm_conv_bias=False, forward_type="v05_noz", mlp_ratio=4.0,
                downsample_version="v3", patchembed_version="v2", **kw)


def vmamba_base(**kw):
    return VSSM(depths=(2, 2, 15, 2), dims=128, ssm_d_state=1, ssm_ratio=2.0,
                ssm_conv_bias=False, forward_type="v05_noz", mlp_ratio=4.0,
                downsample_version="v3", patchembed_version="v2", **kw)
