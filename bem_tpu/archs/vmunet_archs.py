"""VMUNet-family archs: plain, naive two-branch, tuned, fused.

Parity:
- VMUNet              (VMUnet_arch.py:69-250): plain single-branch VSS U-Net.
- NaiveVMUNetTwoBranch (TwoBranchNaive_arch.py:68-284): two branches,
  averaged output.
- TunedModel          (TunedModel_arch.py:189-422): two branches + SE and
  spatial attention at each bottleneck, conv fusion of outputs.
- FusedTunedModel     (FusedModel_arch.py:101-345): TunedModel + one
  bidirectional CrossFusionBlock exchange at the deepest encoder level.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import init as inits
from ..nn.layers import Conv2d, ConvTranspose2d
from ..utils.registry import ARCH_REGISTRY
from .arch_util import CrossFusionBlock, SEBlock, SpatialAttention
from .decomp_archs import PlainVSSUNet, VSSLevel, _d_state_list


class _BranchCfg(nn.Module):
    in_channels: int = 3
    out_channels: int = 3
    n_feat: int = 40
    stage: int = 1
    num_blocks: Sequence[int] = (2, 2, 2)
    d_state: Union[int, Sequence[int]] = 1
    ssm_ratio: float = 1
    mlp_ratio: float = 4
    mlp_type: str = "gdmlp"
    use_pixelshuffle: bool = False
    drop_path: float = 0.0
    use_illu: bool = False
    sam: bool = False
    last_act: Optional[str] = None
    scan_backend: Optional[str] = None

    def _common(self):
        return dict(ssm_ratio=self.ssm_ratio, mlp_ratio=self.mlp_ratio,
                    mlp_type=self.mlp_type, scan_backend=self.scan_backend)

    def _encode(self, x, tag=""):
        levels = len(self.num_blocks)
        d_state = _d_state_list(self.d_state, levels)
        fea = Conv2d(self.n_feat, 3, padding=1,
                     kernel_init=inits.kaiming_normal("fan_out", "linear"),
                     bias_init=inits.zeros, name=f"first_conv{tag}")(x)
        skips = []
        dim = self.n_feat
        for i in range(levels - 1):
            fea = VSSLevel(dim, self.num_blocks[i], d_state[i],
                           name=f"enc{tag}_{i}", **self._common())(fea)
            skips.append(fea)
            fea = Conv2d(dim * 2, 4, strides=2, padding=1, use_bias=False,
                         name=f"down{tag}_{i}")(fea)
            dim *= 2
        return fea, skips, dim

    def _bottleneck(self, fea, dim, tag=""):
        levels = len(self.num_blocks)
        d_state = _d_state_list(self.d_state, levels)
        return VSSLevel(dim, self.num_blocks[-1], d_state[-1],
                        name=f"bottleneck{tag}", **self._common())(fea)

    def _decode(self, fea, skips, dim, tag=""):
        levels = len(self.num_blocks)
        d_state = _d_state_list(self.d_state, levels)
        for i in range(levels - 1):
            lvl = levels - 2 - i
            fea = ConvTranspose2d(dim // 2, 2, 2, name=f"up{tag}_{i}")(fea)
            fea = Conv2d(dim // 2, 1, padding=0, use_bias=False,
                         name=f"fuse{tag}_{i}")(
                jnp.concatenate([fea, skips[lvl]], axis=-1)
            )
            fea = VSSLevel(dim // 2, self.num_blocks[lvl], d_state[lvl],
                           name=f"dec{tag}_{i}", **self._common())(fea)
            dim //= 2
        out = Conv2d(self.out_channels, 3, padding=1, bias_init=inits.zeros,
                     name=f"proj{tag}")(fea)
        if self.last_act == "relu":
            out = jax.nn.relu(out)
        elif self.last_act == "softmax":
            out = jax.nn.softmax(out, axis=-1)
        return out


@ARCH_REGISTRY.register()
class VMUNet(_BranchCfg):
    @nn.compact
    def __call__(self, x, mask=None):
        fea, skips, dim = self._encode(x)
        fea = self._bottleneck(fea, dim)
        out = self._decode(fea, skips, dim)
        return [x, out]


@ARCH_REGISTRY.register()
class NaiveVMUNetTwoBranch(_BranchCfg):
    """Two independent branches; outputs averaged (TwoBranchNaive_arch.py:266-271)."""

    @nn.compact
    def __call__(self, x, mask=None):
        f1, s1, dim = self._encode(x, "")
        f1 = self._bottleneck(f1, dim, "")
        out1 = self._decode(f1, s1, dim, "")
        f2, s2, _ = self._encode(x, "2")
        f2 = self._bottleneck(f2, dim, "2")
        out2 = self._decode(f2, s2, dim, "2")
        return [x, (out1 + out2) / 2.0]


class _OutFusion(nn.Module):
    """conv3x3 -> ReLU -> conv3x3 output fusion (TunedModel_arch.py:316-320)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.out_channels, 3, padding=1, name="conv1")(x)
        x = jax.nn.relu(x)
        return Conv2d(self.out_channels, 3, padding=1, name="conv2")(x)


@ARCH_REGISTRY.register()
class TunedModel(_BranchCfg):
    """Two branches + bottleneck SE/spatial attention + conv output fusion."""

    @nn.compact
    def __call__(self, x, mask=None):
        f1, s1, dim = self._encode(x, "")
        f1 = self._bottleneck(f1, dim, "")
        f1 = SEBlock(dim, name="bottleneck_se")(f1)
        f1 = SpatialAttention(name="spatial_attention")(f1)
        out1 = self._decode(f1, s1, dim, "")

        f2, s2, _ = self._encode(x, "2")
        f2 = self._bottleneck(f2, dim, "2")
        f2 = SEBlock(dim, name="bottleneck_se2")(f2)
        f2 = SpatialAttention(name="spatial_attention2")(f2)
        out2 = self._decode(f2, s2, dim, "2")

        fused = _OutFusion(self.out_channels, name="fusion")(
            jnp.concatenate([out1, out2], axis=-1)
        )
        return [x, fused]


@ARCH_REGISTRY.register()
class FusedTunedModel(_BranchCfg):
    """TunedModel + bidirectional cross-fusion at the deepest encoder level
    (FusedModel_arch.py:298-300)."""

    @nn.compact
    def __call__(self, x, mask=None):
        f1, s1, dim = self._encode(x, "")
        f2, s2, _ = self._encode(x, "2")

        f2 = CrossFusionBlock(dim, name="cross_fusion_12")(f1, f2)
        f1 = CrossFusionBlock(dim, name="cross_fusion_21")(f2, f1)

        f1 = self._bottleneck(f1, dim, "")
        f1 = SEBlock(dim, name="bottleneck_se")(f1)
        f1 = SpatialAttention(name="spatial_attention")(f1)
        f2 = self._bottleneck(f2, dim, "2")
        f2 = SEBlock(dim, name="bottleneck_se2")(f2)
        f2 = SpatialAttention(name="spatial_attention2")(f2)

        out1 = self._decode(f1, s1, dim, "")
        out2 = self._decode(f2, s2, dim, "2")
        fused = _OutFusion(self.out_channels, name="fusion")(
            jnp.concatenate([out1, out2], axis=-1)
        )
        return [x, fused]
