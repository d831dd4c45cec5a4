"""`Network` — the BEM CG/IE U-Net of VSSBlocks.

Parity: basicsr/archs/UNet_arch.py — BasicBlock:179, SubNetwork:245,
Network:364. Channels-last NHWC. The ``bayesian`` flag replaces the
reference's post-hoc convert2bnn_selective: SubNetwork's BasicBlocks carry
``bayesian=True`` semantics (UNet_arch.py:294,309,326), so when the model is
built with ``bayesian=True`` every conv/linear inside the VSS blocks becomes
a reparameterized layer while first_conv/proj stay deterministic — the exact
module set the reference converts (tools.py:48-63).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import init as inits
from ..nn.layers import Conv2d, Conv2dParams, DropPath
from ..nn.vss import VSSBlock
from ..utils.registry import ARCH_REGISTRY
from .arch_util import (
    ConvDown,
    DeconvUp,
    DualUpSample,
    PatchMerging,
    SAM,
    _fold_dual_upsample,
)


class BasicBlock(nn.Module):
    """num_blocks VSSBlocks (+ optional SAM) (UNet_arch.py:179-242)."""

    dim: int
    num_blocks: int = 2
    d_state: int = 1
    ssm_ratio: float = 1
    mlp_ratio: float = 4
    mlp_type: str = "gdmlp"
    sam: bool = False
    bayesian: bool = False
    sigma_init: float = 0.05
    scan_backend: Optional[str] = None
    layout: str = "NHWC"
    # run the VSSBlock sequence in a different compute layout than the
    # surrounding U-Net plumbing (one transpose pair per sequence): the
    # blocks' elementwise/LN/proj ops are lane-dense channel-first at
    # narrow C while convs/up/down stay in XLA's preferred NHWC. Params
    # are layout-independent (tests/test_layouts.py).
    block_layout: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        inner = self.block_layout
        if inner is None and self.layout == "NHWC" and self.mlp_type == "gdmlp":
            # auto: on the pallas (TPU) backend, sub-lane-width levels run
            # the block interior channel-first — the fused CF kernels (SS2D
            # core, gdMlp, LN) measured 67-71 vs 104.9 ms per L0 VSSBlock
            # (C=40, 3.2x NHWC lane padding) with one transpose pair per
            # 2-block sequence; C=80 ties (37.3 vs 37.4) and C=160 loses
            # (24.6 vs 20.3 — 1.6x padding is already mild), hence the
            # dim < 128 gate. Opt out with BEM_BLOCK_CF=0.
            from ..ops.scan import default_backend

            if (self.dim < 128
                    and (self.scan_backend or default_backend()) == "pallas"
                    and os.environ.get("BEM_BLOCK_CF", "1") != "0"):
                inner = "NCHW"
        inner = inner or self.layout
        convert = inner != self.layout and not self.sam
        if convert:
            x = jnp.transpose(x, (0, 3, 1, 2) if inner == "NCHW"
                              else (0, 2, 3, 1))
        for i in range(self.num_blocks):
            x = VSSBlock(
                hidden_dim=self.dim,
                drop_path=0.0,
                ssm_d_state=self.d_state,
                ssm_ratio=self.ssm_ratio,
                ssm_dt_rank="auto",
                ssm_conv=3,
                ssm_conv_bias=False,
                ssm_init="v0",
                forward_type="v05_noz",
                mlp_ratio=self.mlp_ratio,
                mlp_type=self.mlp_type,
                bayesian=self.bayesian,
                sigma_init=self.sigma_init,
                scan_backend=self.scan_backend,
                layout=inner if convert else self.layout,
                name=f"blocks_{i}",
            )(x)
            if self.sam:
                x = SAM(self.dim, name=f"sam_blocks_{i}")(x)
        if convert:
            x = jnp.transpose(x, (0, 2, 3, 1) if inner == "NCHW"
                              else (0, 3, 1, 2))
        return x


class SubNetwork(nn.Module):
    """Shallow U-Net of BasicBlocks with residual output (UNet_arch.py:245-361)."""

    dim: int = 31
    num_blocks: Sequence[int] = (2, 4, 4)
    d_state: Union[int, Sequence[int]] = 1
    ssm_ratio: float = 1
    mlp_ratio: float = 4
    mlp_type: str = "gdmlp"
    use_pixelshuffle: bool = False
    drop_path: float = 0.0
    sam: bool = False
    bayesian: bool = False
    sigma_init: float = 0.05
    scan_backend: Optional[str] = None
    layout: str = "NHWC"
    block_layout: Optional[str] = None  # see BasicBlock.block_layout

    @nn.compact
    def __call__(self, x):
        ch_axis = 1 if self.layout == "NCHW" else -1
        level = len(self.num_blocks) - 1
        d_state = self.d_state
        if isinstance(d_state, int):
            d_state = [d_state] * len(self.num_blocks)

        common = dict(
            ssm_ratio=self.ssm_ratio,
            mlp_ratio=self.mlp_ratio,
            mlp_type=self.mlp_type,
            sam=self.sam,
            bayesian=self.bayesian,
            sigma_init=self.sigma_init,
            scan_backend=self.scan_backend,
            layout=self.layout,
        )

        def blk_layout(dim):
            # wide levels (dim >= 128) run their VSSBlock sequences NHWC
            # even when the surrounding stream is channel-first: the CF
            # gdMlp's W1-folded dwconv FLOPs grow as C^2 and lose to the
            # XLA NHWC form at C=160 (traced +12 ms/iter round 5; mirrors
            # BasicBlock's dim<128 auto-CF gate in the NHWC plumbing)
            if self.block_layout is None and self.layout == "NCHW" \
                    and dim >= 128:
                return "NHWC"
            return self.block_layout

        fea = x
        skips = []
        curr_dim = self.dim
        for i in range(level):
            fea = BasicBlock(
                dim=curr_dim, num_blocks=self.num_blocks[i], d_state=d_state[i],
                block_layout=blk_layout(curr_dim), name=f"enc_{i}", **common,
            )(fea)
            skips.append(fea)
            if self.use_pixelshuffle:
                fea = PatchMerging(curr_dim, bayesian=False, layout=self.layout,
                                   name=f"down_{i}")(fea)
            else:
                fea = ConvDown(curr_dim, bayesian=False, layout=self.layout,
                               name=f"down_{i}")(fea)
            curr_dim *= 2

        fea = BasicBlock(
            dim=curr_dim, num_blocks=self.num_blocks[-1], d_state=d_state[level],
            block_layout=blk_layout(curr_dim), name="bottleneck", **common,
        )(fea)

        for i in range(level):
            skip = skips[level - 1 - i]
            if self.use_pixelshuffle and _fold_dual_upsample(fea.dtype):
                # folded serving form: the fusion conv's two halves fold
                # into DualUpSample's quarter-res tail (up half) and a
                # skip-side 1x1 that XLA fuses into the output add chain —
                # the full-res concat+conv disappears (same params)
                kf, _ = Conv2dParams(
                    curr_dim, curr_dim // 2, 1, use_bias=False,
                    name=f"fusion_{i}")()
                kf = kf[0, 0]
                up = DualUpSample(curr_dim, scale_factor=2, layout=self.layout,
                                  name=f"up_{i}")(
                    fea, fold_tail=kf[: curr_dim // 2])
                spec = ("bchw,cd->bdhw" if self.layout == "NCHW"
                        else "bhwc,cd->bhwd")
                fea = up + jnp.einsum(
                    spec, skip, kf[curr_dim // 2:].astype(fea.dtype),
                    preferred_element_type=jnp.float32).astype(fea.dtype)
            else:
                if self.use_pixelshuffle:
                    fea = DualUpSample(curr_dim, scale_factor=2,
                                       layout=self.layout, name=f"up_{i}")(fea)
                else:
                    fea = DeconvUp(curr_dim, layout=self.layout,
                                   name=f"up_{i}")(fea)
                fea = Conv2d(curr_dim // 2, 1, padding=0, use_bias=False,
                             data_format=self.layout, name=f"fusion_{i}")(
                    jnp.concatenate([fea, skip], axis=ch_axis)
                )
            fea = BasicBlock(
                dim=curr_dim // 2, num_blocks=self.num_blocks[level - 1 - i],
                d_state=d_state[level - 1 - i],
                block_layout=blk_layout(curr_dim // 2), name=f"dec_{i}",
                **common,
            )(fea)
            curr_dim //= 2

        return x + DropPath(self.drop_path, name="drop_path")(fea)


@ARCH_REGISTRY.register(name="Network")
class Network(nn.Module):
    """Stage-I (CG) / Stage-II (IE) U-Net (UNet_arch.py:364-474).

    __call__(x, mask) -> [x, out] like the reference's out_list.
    """

    in_channels: int = 3
    out_channels: int = 3
    n_feat: int = 40
    stage: int = 1
    num_blocks: Sequence[int] = (1, 1, 1)
    d_state: Union[int, Sequence[int]] = 1
    ssm_ratio: float = 1
    mlp_ratio: float = 4
    mlp_type: str = "gdmlp"
    use_pixelshuffle: bool = False
    drop_path: float = 0.0
    use_illu: bool = False
    sam: bool = False
    last_act: Optional[str] = None
    bayesian: bool = False
    sigma_init: float = 0.05
    scan_backend: Optional[str] = None
    layout: str = "NHWC"  # 'NCHW': channel-first compute (W-minor, compact
    # HBM for narrow channel counts); the public API stays NHWC.
    block_layout: Optional[str] = None  # run VSSBlock sequences in this
    # layout while the U-Net plumbing stays in `layout` (BasicBlock docs)
    stream_cf: Optional[bool] = None  # run the WHOLE SubNetwork stream
    # (blocks + PatchMerging/DualUpSample/fusion seams) channel-first with
    # ONE transpose pair at full resolution, while first_conv/proj keep the
    # NHWC layout XLA prefers for 3x3 convs. None = auto: on the pallas
    # (TPU) backend, where the CF block interiors are already the fast path
    # and the old per-BasicBlock NHWC round-trips + NHWC seam relayouts cost
    # ~60 ms/serving-iter (traced round 5). Opt out with BEM_STREAM_CF=0.

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        cf = self.layout == "NCHW"
        outs = [x]
        stream_cf = self.stream_cf
        if stream_cf is None:
            from ..ops.scan import default_backend

            stream_cf = (
                self.layout == "NHWC" and not self.sam
                and self.mlp_type == "gdmlp"
                and (self.scan_backend or default_backend()) == "pallas"
                and os.environ.get("BEM_STREAM_CF", "1") != "0")
        # io_cf experiment: run first_conv/proj channel-first too, so the
        # boundary transposes move to the 3/6-channel IO tensors (6/40 of
        # the feature bytes) and the NHWC convs' 21-42x output lane padding
        # on 3-channel tensors disappears (traced 8.3 + 4.6 ms round 5)
        io_cf = (stream_cf and self.layout == "NHWC"
                 and os.environ.get("BEM_IO_CF", "0") == "1")
        conv_fmt = "NCHW" if (cf or io_cf) else "NHWC"
        sub_layout = "NCHW" if (stream_cf and self.layout == "NHWC") \
            else self.layout
        if cf or io_cf:
            x_in = jnp.transpose(x, (0, 3, 1, 2))
        else:
            x_in = x
        fea = Conv2d(
            self.n_feat, 3, padding=1, use_bias=True,
            kernel_init=inits.kaiming_normal(mode="fan_out", nonlinearity="linear"),
            bias_init=inits.zeros, data_format=conv_fmt,
            name="first_conv",
        )(x_in)

        # MIM masking (UNet_arch.py:402-403,464-467)
        mask_token = self.param(
            "mask_token", inits.trunc_normal(std=0.02), (1, 1, 1, self.n_feat)
        )
        if mask is not None:
            if conv_fmt == "NCHW":
                w = mask[:, None].astype(fea.dtype)  # (B, 1, H, W)
                tok = mask_token.reshape(1, self.n_feat, 1, 1).astype(fea.dtype)
            else:
                w = mask[..., None].astype(fea.dtype)  # (B, H, W, 1)
                tok = mask_token.astype(fea.dtype)
            fea = fea * (1.0 - w) + tok * w

        proj = Conv2d(self.out_channels, 3, padding=1, use_bias=True,
                      bias_init=inits.zeros, data_format=conv_fmt,
                      name="proj")

        out = None
        for i in range(self.stage):
            if sub_layout == "NCHW" and conv_fmt == "NHWC":
                fea = jnp.transpose(fea, (0, 3, 1, 2))
            fea = SubNetwork(
                dim=self.n_feat,
                num_blocks=self.num_blocks,
                d_state=self.d_state,
                ssm_ratio=self.ssm_ratio,
                mlp_ratio=self.mlp_ratio,
                mlp_type=self.mlp_type,
                use_pixelshuffle=self.use_pixelshuffle,
                drop_path=self.drop_path,
                sam=self.sam,
                bayesian=self.bayesian,
                sigma_init=self.sigma_init,
                scan_backend=self.scan_backend,
                layout=sub_layout,
                block_layout=self.block_layout,
                name=f"subnets_{i}",
            )(fea)
            if sub_layout == "NCHW" and conv_fmt == "NHWC":
                fea = jnp.transpose(fea, (0, 2, 3, 1))
            out = proj(fea)
            if conv_fmt == "NCHW":
                out = jnp.transpose(out, (0, 2, 3, 1))
            if self.last_act == "relu":
                out = jax.nn.relu(out)
            elif self.last_act == "softmax":
                out = jax.nn.softmax(out, axis=-1)
            outs.append(out)
        return outs
