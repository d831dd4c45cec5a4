"""Decomposition-domain enhancement archs (the BEM flagship family).

Parity targets:
- DecompSingleBranch      (DecompSingleBranch_arch.py:52-237)
- DecompSingleBranchDD    (DecompSingleBranchDD_arch.py:53-264)
- DecompDualBranch        (DecompModel_arch.py:101-354, cross-fusion/SE/spatial)
- DecompDualBranch2       (DecompDualBranch_arch.py:50-298)
- DecompDualBranch2DD     (DecompDualBranchDD_arch.py:52-315)
- DecompDualBranchDDWavelet (DecompDualBranchDDWavelet_arch.py:146-369) —
  the best model (README.md:8-11).

All archs embed a FROZEN QD decomposition (reference loads
model{1..4}_999.pth at build time and detaches it). Here the decomp is a
flax submodule whose outputs are stop_gradient'ed; its converted checkpoint
params are injected by ``load_frozen`` (called by BaseModel.init_state) and
the optimizer masks the ``decomp`` subtree (AdamW weight decay must not
touch frozen weights).

All share one plain VSS U-Net shape: 3x3 stem -> [VSSBlocks -> 4x4/s2
conv-down] x L -> bottleneck VSSBlocks -> [2x2/s2 deconv-up -> 1x1 skip fuse
-> VSSBlocks] x L -> 3x3 proj. (The reference ignores use_pixelshuffle in
this family — conv_down/deconv_up either way.)
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import init as inits
from ..nn.layers import Conv2d, ConvTranspose2d
from ..nn.vss import VSSBlock
from ..ops.quaternion import hamilton_product
from ..ops.wavelet import iwt2
from ..qd.models import Decomp, Q1_W_INDICES, Q2_W_INDICES
from ..utils.registry import ARCH_REGISTRY
from .arch_util import CrossFusionBlock, SEBlock, SpatialAttention


def _d_state_list(d_state, n):
    return [d_state] * n if isinstance(d_state, int) else list(d_state)


class VSSLevel(nn.Module):
    """num_blocks VSSBlocks at one scale (reference _make_level)."""

    dim: int
    num_blocks: int
    d_state: int = 1
    ssm_ratio: float = 1
    mlp_ratio: float = 4
    mlp_type: str = "gdmlp"
    scan_backend: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            x = VSSBlock(
                hidden_dim=self.dim,
                ssm_d_state=self.d_state,
                ssm_ratio=self.ssm_ratio,
                mlp_ratio=self.mlp_ratio,
                mlp_type=self.mlp_type,
                forward_type="v05_noz",
                scan_backend=self.scan_backend,
                name=f"block_{i}",
            )(x)
        return x


class PlainVSSUNet(nn.Module):
    """first_conv -> enc/down -> bottleneck -> up/fuse/dec -> proj."""

    out_channels: int
    n_feat: int = 40
    num_blocks: Sequence[int] = (2, 2, 2)
    d_state: Union[int, Sequence[int]] = 1
    ssm_ratio: float = 1
    mlp_ratio: float = 4
    mlp_type: str = "gdmlp"
    last_act: Optional[str] = None
    scan_backend: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        levels = len(self.num_blocks)
        d_state = _d_state_list(self.d_state, levels)
        common = dict(ssm_ratio=self.ssm_ratio, mlp_ratio=self.mlp_ratio,
                      mlp_type=self.mlp_type, scan_backend=self.scan_backend)

        fea = Conv2d(
            self.n_feat, 3, padding=1,
            kernel_init=inits.kaiming_normal("fan_out", "linear"),
            bias_init=inits.zeros, name="first_conv",
        )(x)
        skips = []
        dim = self.n_feat
        for i in range(levels - 1):
            fea = VSSLevel(dim, self.num_blocks[i], d_state[i],
                           name=f"enc_{i}", **common)(fea)
            skips.append(fea)
            fea = Conv2d(dim * 2, 4, strides=2, padding=1, use_bias=False,
                         name=f"down_{i}")(fea)
            dim *= 2
        fea = VSSLevel(dim, self.num_blocks[-1], d_state[-1],
                       name="bottleneck", **common)(fea)
        for i in range(levels - 1):
            lvl = levels - 2 - i
            fea = ConvTranspose2d(dim // 2, 2, 2, name=f"up_{i}")(fea)
            fea = Conv2d(dim // 2, 1, padding=0, use_bias=False, name=f"fuse_{i}")(
                jnp.concatenate([fea, skips[lvl]], axis=-1)
            )
            fea = VSSLevel(dim // 2, self.num_blocks[lvl], d_state[lvl],
                           name=f"dec_{i}", **common)(fea)
            dim //= 2
        out = Conv2d(self.out_channels, 3, padding=1, bias_init=inits.zeros,
                     name="proj")(fea)
        if self.last_act == "relu":
            out = jax.nn.relu(out)
        elif self.last_act == "softmax":
            out = jax.nn.softmax(out, axis=-1)
        return out


class _DualBranchUNet(nn.Module):
    """Two encoder/decoder branches with a shared fused bottleneck
    (DecompDualBranch_arch.py / DDWavelet structure)."""

    out_channels: int
    n_feat: int = 40
    num_blocks: Sequence[int] = (2, 2, 2)
    d_state: Union[int, Sequence[int]] = 1
    ssm_ratio: float = 1
    mlp_ratio: float = 4
    mlp_type: str = "gdmlp"
    last_act: Optional[str] = None
    scan_backend: Optional[str] = None

    @nn.compact
    def __call__(self, q1, q2):
        levels = len(self.num_blocks)
        d_state = _d_state_list(self.d_state, levels)
        common = dict(ssm_ratio=self.ssm_ratio, mlp_ratio=self.mlp_ratio,
                      mlp_type=self.mlp_type, scan_backend=self.scan_backend)

        def encode(x, tag):
            fea = Conv2d(
                self.n_feat, 3, padding=1,
                kernel_init=inits.kaiming_normal("fan_out", "linear"),
                bias_init=inits.zeros, name=f"first_conv_{tag}",
            )(x)
            skips = []
            dim = self.n_feat
            for i in range(levels - 1):
                fea = VSSLevel(dim, self.num_blocks[i], d_state[i],
                               name=f"enc_{tag}_{i}", **common)(fea)
                skips.append(fea)
                fea = Conv2d(dim * 2, 4, strides=2, padding=1, use_bias=False,
                             name=f"down_{tag}_{i}")(fea)
                dim *= 2
            return fea, skips, dim

        f1, skips1, dim = encode(q1, "Q1")
        f2, skips2, _ = encode(q2, "Q2")

        fused = Conv2d(dim, 1, padding=0, use_bias=False, name="bottleneck_fuse")(
            jnp.concatenate([f1, f2], axis=-1)
        )
        fused = VSSLevel(dim, self.num_blocks[-1], d_state[-1],
                         name="bottleneck", **common)(fused)
        d1 = Conv2d(dim, 1, padding=0, use_bias=False, name="bottleneck_to_Q1")(fused)
        d2 = Conv2d(dim, 1, padding=0, use_bias=False, name="bottleneck_to_Q2")(fused)

        def decode(fea, skips, tag):
            dim_ = dim
            for i in range(levels - 1):
                lvl = levels - 2 - i
                fea = ConvTranspose2d(dim_ // 2, 2, 2, name=f"up_{tag}_{i}")(fea)
                fea = Conv2d(dim_ // 2, 1, padding=0, use_bias=False,
                             name=f"fuse_{tag}_{i}")(
                    jnp.concatenate([fea, skips[lvl]], axis=-1)
                )
                fea = VSSLevel(dim_ // 2, self.num_blocks[lvl], d_state[lvl],
                               name=f"dec_{tag}_{i}", **common)(fea)
                dim_ //= 2
            out = Conv2d(self.out_channels, 3, padding=1, bias_init=inits.zeros,
                         name=f"proj_{tag}")(fea)
            if self.last_act == "relu":
                out = jax.nn.relu(out)
            elif self.last_act == "softmax":
                out = jax.nn.softmax(out, axis=-1)
            return out

        return decode(d1, skips1, "Q1"), decode(d2, skips2, "Q2")


class _DecompArchBase(nn.Module):
    """Shared config + frozen-decomp plumbing for the family."""

    in_channels: int = 6
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
    decomp_model: str = "model1"
    scan_backend: Optional[str] = None

    def _decomp(self):
        return Decomp(model_type=self.decomp_model, name="decomp")

    def load_frozen(self, params):
        """Inject the converted frozen QD checkpoint into params['decomp']
        (the reference loads + freezes at build time,
        DecompSingleBranch_arch.py:80-99)."""
        from ..qd.convert import load_decomp_params

        loaded = load_decomp_params(self.decomp_model)
        params = dict(params)
        base = dict(params["decomp"])
        # wavelet-feature variants have no PostSmooth params in the module;
        # keep only keys the module declared
        params["decomp"] = {k: loaded[k] if k in loaded else v for k, v in base.items()}
        return params

    @staticmethod
    def frozen_subtrees():
        """Param-tree prefixes the optimizer must not touch."""
        return ("decomp",)

    def _unet_kwargs(self):
        return dict(
            n_feat=self.n_feat, num_blocks=self.num_blocks, d_state=self.d_state,
            ssm_ratio=self.ssm_ratio, mlp_ratio=self.mlp_ratio,
            mlp_type=self.mlp_type, last_act=self.last_act,
            scan_backend=self.scan_backend,
        )


def _frozen(fn, *args):
    return tuple(jax.lax.stop_gradient(t) for t in fn(*args))


@ARCH_REGISTRY.register()
class DecompSingleBranch(_DecompArchBase):
    """decomp(img) -> cat(Q1, Q2, cond)=11ch -> one U-Net -> 8ch -> Q1 x Q2."""

    @nn.compact
    def __call__(self, x, mask=None):
        img, cond = x[..., :3], x[..., 3:]
        q1, q2 = _frozen(self._decomp(), img)
        fea = jnp.concatenate([q1, q2, cond], axis=-1)
        out = PlainVSSUNet(out_channels=8, name="unet", **self._unet_kwargs())(fea)
        final = hamilton_product(out[..., :4], out[..., 4:])[..., 1:]
        return [x, final]


@ARCH_REGISTRY.register()
class DecompSingleBranchDD(_DecompArchBase):
    """decomp(img) + decomp(cond) -> 16ch -> one U-Net -> 8ch -> Q1 x Q2
    (DecompSingleBranchDD_arch.py:53-264)."""

    @nn.compact
    def __call__(self, x, mask=None):
        img, cond = x[..., :3], x[..., 3:]
        decomp = self._decomp()
        q1i, q2i = _frozen(decomp, img)
        q1c, q2c = _frozen(decomp, cond)
        fea = jnp.concatenate([q1i, q2i, q1c, q2c], axis=-1)
        out = PlainVSSUNet(out_channels=8, name="unet", **self._unet_kwargs())(fea)
        final = hamilton_product(out[..., :4], out[..., 4:])[..., 1:]
        return [x, final]


@ARCH_REGISTRY.register()
class DecompDualBranch2(_DecompArchBase):
    """cond zero-padded to 4ch, ADDED to Q1/Q2; dual branch U-Nets with
    shared bottleneck (DecompDualBranch_arch.py:50-298)."""

    @nn.compact
    def __call__(self, x, mask=None):
        img, cond = x[..., :3], x[..., 3:6]
        q1, q2 = _frozen(self._decomp(), img)
        cond_q = jnp.concatenate([cond, jnp.zeros_like(cond[..., :1])], axis=-1)
        q1 = q1 + cond_q
        q2 = q2 + cond_q
        o1, o2 = _DualBranchUNet(out_channels=4, name="branches",
                                 **self._unet_kwargs())(q1, q2)
        final = hamilton_product(o1, o2)[..., 1:]
        return [img, final]


@ARCH_REGISTRY.register()
class DecompDualBranch2DD(_DecompArchBase):
    """decomp image AND cond; per-branch input cat(Q_img, Q_cond)=8ch
    (DecompDualBranchDD_arch.py:52-315)."""

    @nn.compact
    def __call__(self, x, mask=None):
        img, cond = x[..., :3], x[..., 3:6]
        decomp = self._decomp()
        q1i, q2i = _frozen(decomp, img)
        q1c, q2c = _frozen(decomp, cond)
        q1 = jnp.concatenate([q1i, q1c], axis=-1)
        q2 = jnp.concatenate([q2i, q2c], axis=-1)
        o1, o2 = _DualBranchUNet(out_channels=4, name="branches",
                                 **self._unet_kwargs())(q1, q2)
        final = hamilton_product(o1, o2)[..., 1:]
        return [x, final]


@ARCH_REGISTRY.register()
class DecompDualBranchDDWavelet(_DecompArchBase):
    """Wavelet-domain dual branch: decomp stops before IWT; branches run at
    H/2 x W/2 on 32ch inputs; IWT after the decoders; Hamilton product in
    pixel space (DecompDualBranchDDWavelet_arch.py:146-369). The best model
    (README.md:8-11)."""

    @nn.compact
    def __call__(self, x, mask=None):
        img, cond = x[..., :3], x[..., 3:6]
        decomp = self._decomp()
        q1i_w, q2i_w = _frozen(lambda t: decomp.wavelet_features(t), img)
        q1c_w, q2c_w = _frozen(lambda t: decomp.wavelet_features(t), cond)
        q1 = jnp.concatenate([q1i_w, q1c_w], axis=-1)  # 32ch @ H/2
        q2 = jnp.concatenate([q2i_w, q2c_w], axis=-1)
        o1_w, o2_w = _DualBranchUNet(out_channels=16, name="branches",
                                     **self._unet_kwargs())(q1, q2)
        o1 = iwt2(o1_w)
        o2 = iwt2(o2_w)
        final = hamilton_product(o1, o2)[..., 1:]
        return [x, final]


@ARCH_REGISTRY.register()
class DecompDualBranch(_DecompArchBase):
    """Two independent U-Nets over Q1/Q2 with one cross-fusion exchange at
    the deepest encoder level + SE/spatial attention at the bottleneck
    (DecompModel_arch.py:101-354)."""

    @nn.compact
    def __call__(self, x, mask=None):
        img = x[..., :3]
        q1, q2 = _frozen(self._decomp(), img)
        levels = len(self.num_blocks)
        d_state = _d_state_list(self.d_state, levels)
        common = dict(ssm_ratio=self.ssm_ratio, mlp_ratio=self.mlp_ratio,
                      mlp_type=self.mlp_type, scan_backend=self.scan_backend)

        def encode(x_, tag):
            fea = Conv2d(self.n_feat, 3, padding=1,
                         kernel_init=inits.kaiming_normal("fan_out", "linear"),
                         bias_init=inits.zeros, name=f"first_conv{tag}")(x_)
            skips = []
            dim = self.n_feat
            for i in range(levels - 1):
                fea = VSSLevel(dim, self.num_blocks[i], d_state[i],
                               name=f"enc{tag}_{i}", **common)(fea)
                skips.append(fea)
                fea = Conv2d(dim * 2, 4, strides=2, padding=1, use_bias=False,
                             name=f"down{tag}_{i}")(fea)
                dim *= 2
            return fea, skips, dim

        f1, skips1, dim = encode(q1, "")
        f2, skips2, _ = encode(q2, "2")

        # single cross-level fusion exchange (DecompModel_arch.py:320-322)
        f2 = CrossFusionBlock(dim, name="cross_fusion_12")(f1, f2)
        f1 = CrossFusionBlock(dim, name="cross_fusion_21")(f2, f1)

        f1 = VSSLevel(dim, self.num_blocks[-1], d_state[-1],
                      name="bottleneck", **common)(f1)
        f1 = SEBlock(dim, name="bottleneck_se")(f1)
        f1 = SpatialAttention(name="spatial_attention")(f1)
        f2 = VSSLevel(dim, self.num_blocks[-1], d_state[-1],
                      name="bottleneck2", **common)(f2)
        f2 = SEBlock(dim, name="bottleneck_se2")(f2)
        f2 = SpatialAttention(name="spatial_attention2")(f2)

        def decode(fea, skips, tag):
            dim_ = dim
            for i in range(levels - 1):
                lvl = levels - 2 - i
                fea = ConvTranspose2d(dim_ // 2, 2, 2, name=f"up{tag}_{i}")(fea)
                fea = Conv2d(dim_ // 2, 1, padding=0, use_bias=False,
                             name=f"fuse{tag}_{i}")(
                    jnp.concatenate([fea, skips[lvl]], axis=-1)
                )
                fea = VSSLevel(dim_ // 2, self.num_blocks[lvl], d_state[lvl],
                               name=f"dec{tag}_{i}", **common)(fea)
                dim_ //= 2
            return Conv2d(4, 3, padding=1, bias_init=inits.zeros,
                          name=f"proj{tag}")(fea)

        o1 = decode(f1, skips1, "")
        o2 = decode(f2, skips2, "2")
        final = hamilton_product(o1, o2)[..., 1:]
        return [x, final]
