"""Torch -> flax weight conversion for the `Network` (CG/IE U-Net) arch.

Lets released reference checkpoints (``ckpt.pth`` with ``params`` /
``params_ema`` state dicts of basicsr/archs/UNet_arch.py Network) run in
bem_tpu. Handles both deterministic layers and BNN-converted layers
(mu_weight/rho_weight pairs from basicsr/bayesian/*Reparameterization).

Layout rules: Conv OIHW->HWIO; Linear/Linear2d (out,in)->(in,out);
ConvTranspose (I,O,kh,kw)->flipped HWIO; LayerNorm weight->scale.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..utils.torch_convert import (
    assemble,
    conv_kernel,
    conv_transpose_kernel,
    linear_kernel,
    load_torch_state_dict,
)


class _Mapper:
    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = sd
        self.out: Dict[str, np.ndarray] = {}
        self.used = set()

    def _get(self, key):
        self.used.add(key)
        return self.sd[key]

    def conv(self, dst, src):
        """Conv2d (or its Conv2dReparameterization twin)."""
        if f"{src}.mu_weight" in self.sd:
            self.out[f"{dst}/mu_kernel"] = conv_kernel(self._get(f"{src}.mu_weight"))
            self.out[f"{dst}/rho_kernel"] = conv_kernel(self._get(f"{src}.rho_weight"))
            if f"{src}.mu_bias" in self.sd:
                self.out[f"{dst}/mu_bias"] = self._get(f"{src}.mu_bias")
                self.out[f"{dst}/rho_bias"] = self._get(f"{src}.rho_bias")
            return
        self.out[f"{dst}/kernel"] = conv_kernel(self._get(f"{src}.weight"))
        if f"{src}.bias" in self.sd:
            self.out[f"{dst}/bias"] = self._get(f"{src}.bias")

    def linear(self, dst, src):
        """Linear / Linear2d (or reparameterized)."""
        if f"{src}.mu_weight" in self.sd:
            w = self._get(f"{src}.mu_weight")
            self.out[f"{dst}/mu_kernel"] = linear_kernel(w.reshape(w.shape[0], -1))
            r = self._get(f"{src}.rho_weight")
            self.out[f"{dst}/rho_kernel"] = linear_kernel(r.reshape(r.shape[0], -1))
            if f"{src}.mu_bias" in self.sd:
                self.out[f"{dst}/mu_bias"] = self._get(f"{src}.mu_bias")
                self.out[f"{dst}/rho_bias"] = self._get(f"{src}.rho_bias")
            return
        w = self._get(f"{src}.weight")
        self.out[f"{dst}/kernel"] = linear_kernel(w.reshape(w.shape[0], -1))
        if f"{src}.bias" in self.sd:
            self.out[f"{dst}/bias"] = self._get(f"{src}.bias")

    def conv_t(self, dst, src):
        self.out[f"{dst}/kernel"] = conv_transpose_kernel(self._get(f"{src}.weight"))
        if f"{src}.bias" in self.sd:
            self.out[f"{dst}/bias"] = self._get(f"{src}.bias")

    def ln(self, dst, src):
        self.out[f"{dst}/scale"] = self._get(f"{src}.weight")
        self.out[f"{dst}/bias"] = self._get(f"{src}.bias")

    def prelu(self, dst, src):
        self.out[f"{dst}/slope"] = self._get(f"{src}.weight")

    def raw(self, dst, src):
        self.out[dst] = self._get(src)


def _convert_ss2d(m: _Mapper, dst: str, src: str):
    m.linear(f"{dst}/in_proj", f"{src}.in_proj")
    if f"{src}.conv2d.weight" in m.sd or f"{src}.conv2d.mu_weight" in m.sd:
        m.conv(f"{dst}/conv2d", f"{src}.conv2d")
    elif f"{src}.conv2d.1.weight" in m.sd:
        # m0 wraps the conv in Sequential(Permute, Conv2d, Permute)
        # (vmamba.py:1028-1040)
        m.conv(f"{dst}/conv2d", f"{src}.conv2d.1")
    m.raw(f"{dst}/x_proj_weight", f"{src}.x_proj_weight")
    if f"{src}.dt_projs_weight" in m.sd:  # absent in m0 (mamba2) modules
        m.raw(f"{dst}/dt_projs_weight", f"{src}.dt_projs_weight")
    m.raw(f"{dst}/dt_projs_bias", f"{src}.dt_projs_bias")
    m.raw(f"{dst}/A_logs", f"{src}.A_logs")
    m.raw(f"{dst}/Ds", f"{src}.Ds")
    if f"{src}.out_norm.weight" in m.sd:
        m.ln(f"{dst}/out_norm", f"{src}.out_norm")
    m.linear(f"{dst}/out_proj", f"{src}.out_proj")


def _convert_vss_block(m: _Mapper, dst: str, src: str):
    m.ln(f"{dst}/norm", f"{src}.norm")
    _convert_ss2d(m, f"{dst}/op", f"{src}.op")
    if f"{src}.norm2.weight" in m.sd:
        m.ln(f"{dst}/norm2", f"{src}.norm2")
        # gdMlp (the config used everywhere); Mlp variants use fc1/fc2
        if (f"{src}.mlp.project_in.weight" in m.sd
                or f"{src}.mlp.project_in.mu_weight" in m.sd):
            m.conv(f"{dst}/mlp/project_in", f"{src}.mlp.project_in")
            m.conv(f"{dst}/mlp/dwconv", f"{src}.mlp.dwconv")
            m.conv(f"{dst}/mlp/project_out", f"{src}.mlp.project_out")
        else:
            m.linear(f"{dst}/mlp/fc1", f"{src}.mlp.fc1")
            m.linear(f"{dst}/mlp/fc2", f"{src}.mlp.fc2")


def _convert_basic_block(m: _Mapper, dst: str, src: str, num_blocks: int):
    for b in range(num_blocks):
        _convert_vss_block(m, f"{dst}/blocks_{b}", f"{src}.blocks.{b}")


def _convert_dual_upsample(m: _Mapper, dst: str, src: str):
    m.conv(f"{dst}/up_p_conv1", f"{src}.up_p.0")
    m.prelu(f"{dst}/up_p_prelu", f"{src}.up_p.1")
    m.conv(f"{dst}/up_p_conv2", f"{src}.up_p.3")
    m.conv(f"{dst}/up_b_conv1", f"{src}.up_b.0")
    m.prelu(f"{dst}/up_b_prelu", f"{src}.up_b.1")
    m.conv(f"{dst}/up_b_conv2", f"{src}.up_b.3")
    m.conv(f"{dst}/conv", f"{src}.conv")


def convert_network_state(
    sd: Dict[str, np.ndarray],
    num_blocks=(2, 2, 2),
    stage: int = 1,
    use_pixelshuffle: bool = True,
) -> Dict[str, Any]:
    """torch Network state_dict -> flax params for bem_tpu Network."""
    m = _Mapper(sd)
    m.out["mask_token"] = sd["mask_token"].transpose(0, 2, 3, 1)
    m.used.add("mask_token")
    m.conv("first_conv", "first_conv")
    m.conv("proj", "proj")
    levels = len(num_blocks) - 1
    for s in range(stage):
        base = f"subnets.{s}"
        dstb = f"subnets_{s}"
        for i in range(levels):
            _convert_basic_block(
                m, f"{dstb}/enc_{i}", f"{base}.encoder_layers.{i}.0", num_blocks[i]
            )
            down = f"{base}.encoder_layers.{i}.1"
            if use_pixelshuffle:  # PatchMerging
                m.ln(f"{dstb}/down_{i}/norm", f"{down}.norm")
                m.conv(f"{dstb}/down_{i}/reduction", f"{down}.reduction")
            else:
                m.conv(f"{dstb}/down_{i}/conv", down)
        _convert_basic_block(m, f"{dstb}/bottleneck", f"{base}.bottleneck",
                             num_blocks[-1])
        # decoder_layers.{i} is ModuleList([up, fusion_conv, block])
        # (UNet_arch.py:313-330)
        for i in range(levels):
            up = f"{base}.decoder_layers.{i}.0"
            if use_pixelshuffle:
                _convert_dual_upsample(m, f"{dstb}/up_{i}", up)
            else:
                m.conv_t(f"{dstb}/up_{i}/deconv", up)
            m.conv(f"{dstb}/fusion_{i}", f"{base}.decoder_layers.{i}.1")
            _convert_basic_block(
                m, f"{dstb}/dec_{i}", f"{base}.decoder_layers.{i}.2",
                num_blocks[levels - 1 - i],
            )
    return assemble(m.out)


def convert_dualbranch_state(
    sd: Dict[str, np.ndarray], num_blocks=(2, 2, 2)
) -> Dict[str, Any]:
    """torch DecompDualBranchDDWavelet / DecompDualBranch2 branch weights ->
    flax params for the ``branches`` (_DualBranchUNet) subtree
    (DecompDualBranchDDWavelet_arch.py:148-300; the frozen ``decomp.*`` keys
    are intentionally ignored — inject them with the arch's load_frozen)."""
    m = _Mapper(sd)
    levels = len(num_blocks) - 1

    def level(dst, src, nb):
        for b in range(nb):
            _convert_vss_block(m, f"{dst}/block_{b}", f"{src}.{b}")

    for tag in ("Q1", "Q2"):
        m.conv(f"branches/first_conv_{tag}", f"first_conv_{tag}")
        for i in range(levels):
            level(f"branches/enc_{tag}_{i}", f"encoders_{tag}.{i}",
                  num_blocks[i])
            m.conv(f"branches/down_{tag}_{i}", f"down_layers_{tag}.{i}")
    m.conv("branches/bottleneck_fuse", "bottleneck_fuse")
    level("branches/bottleneck", "bottleneck_block", num_blocks[-1])
    m.conv("branches/bottleneck_to_Q1", "bottleneck_to_Q1")
    m.conv("branches/bottleneck_to_Q2", "bottleneck_to_Q2")
    for tag in ("Q1", "Q2"):
        for i in range(levels):
            m.conv_t(f"branches/up_{tag}_{i}", f"decoders_{tag}.{i}.up")
            m.conv(f"branches/fuse_{tag}_{i}", f"decoders_{tag}.{i}.fuse")
            level(f"branches/dec_{tag}_{i}", f"decoders_{tag}.{i}.block",
                  num_blocks[levels - 1 - i])
        m.conv(f"branches/proj_{tag}", f"proj_{tag}")
    return assemble(m.out)


def convert_network_checkpoint(path: str, param_key: str = "params",
                               **kwargs) -> Dict[str, Any]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj[param_key] if param_key in obj else obj
    sd = {k: v.detach().numpy() for k, v in sd.items()}
    return convert_network_state(sd, **kwargs)
