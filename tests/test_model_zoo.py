"""Baseline model zoo: forward smoke tests + parameter-count parity vs the
torch references (analysis/model_zoo/*.py).

Param-count parity (exact) pins every layer's shape to the reference, which
is what the FLOPs/params comparison needs. UVMNet's torch reference cannot
even be imported here (needs the CUDA-only mamba_ssm package), so it gets a
smoke test plus an analytical check of the documented Mamba param formula.
"""

import importlib.util
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference/analysis/model_zoo"


def _param_count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def _flax_params(net, shape, extra_batch_stats=False):
    x = jnp.zeros(shape, jnp.float32)
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    n = _param_count(v["params"])
    return v, n


def _stub_timm():
    """swinIR.py/hat.py import DropPath/to_2tuple/trunc_normal_ from timm
    (not in this environment); provide minimal torch equivalents. Returns
    the layers module (augmenting any pre-existing stub, e.g. from
    ref_loader)."""
    existing = sys.modules.get("timm.models.layers")
    if existing is not None and hasattr(existing, "to_2tuple"):
        return existing
    import collections.abc
    import itertools

    import torch
    import torch.nn as nn

    def to_2tuple(x):
        if isinstance(x, collections.abc.Iterable) and not isinstance(x, str):
            return tuple(x)
        return tuple(itertools.repeat(x, 2))

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a, b)
        return tensor

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x.div(keep) * mask.floor_()

    if existing is not None:
        layers = existing
    else:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")
        timm.models = models
        models.layers = layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    return layers


def _load_ref(name):
    if name in ("swinIR", "hat"):
        _stub_timm()
    path = os.path.join(REF, f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"ref_zoo_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"ref_zoo_{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


def _torch_count(model):
    return sum(p.numel() for p in model.parameters())


# ---------------------------------------------------------------------------


def test_edsr_params_and_forward():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")  # edsr imports basicsr.archs.arch_util
    from ref_loader import load_ref_network_module

    load_ref_network_module()  # provides basicsr.* modules
    ref = _load_ref("edsr")
    want = _torch_count(ref.buildEDSR())

    from bem_tpu.analysis.model_zoo import buildEDSR

    net = buildEDSR()
    v, got = _flax_params(net, (1, 16, 16, 3))
    assert got == want, (got, want)
    y = net.apply(v, jnp.zeros((1, 16, 16, 3)))
    assert y.shape == (1, 32, 32, 3)


@pytest.mark.slow
def test_rcan_params_and_forward():
    torch = pytest.importorskip("torch")
    ref = _load_ref("rcan")
    want = _torch_count(ref.buildRCAN())

    from bem_tpu.analysis.model_zoo import buildRCAN

    net = buildRCAN()
    v, got = _flax_params(net, (1, 16, 16, 3))
    assert got == want, (got, want)
    y = net.apply(v, jnp.zeros((1, 16, 16, 3)))
    assert y.shape == (1, 32, 32, 3)


def test_hwmnet_params_and_forward():
    torch = pytest.importorskip("torch")
    ref = _load_ref("HWMNet")
    want = _torch_count(ref.buildHWMNet())

    from bem_tpu.analysis.model_zoo import buildHWMNet

    net = buildHWMNet()
    v, got = _flax_params(net, (1, 32, 32, 3))
    assert got == want, (got, want)
    y = net.apply(v, jnp.zeros((1, 32, 32, 3)))
    assert y.shape == (1, 32, 32, 3)


def test_retinexformer_params_and_forward():
    torch = pytest.importorskip("torch")
    ref = _load_ref("RetinexFormer")
    want = _torch_count(ref.buildRetinexFormer())

    from bem_tpu.analysis.model_zoo import buildRetinexFormer

    net = buildRetinexFormer()
    v, got = _flax_params(net, (1, 16, 16, 3))
    assert got == want, (got, want)
    y = net.apply(v, jnp.zeros((1, 16, 16, 3)))
    assert y.shape == (1, 16, 16, 3)


@pytest.mark.slow
def test_llformer_params_and_forward():
    torch = pytest.importorskip("torch")
    ref = _load_ref("LLFormer")
    want = _torch_count(ref.buildLLFormer())

    from bem_tpu.analysis.model_zoo import buildLLFormer

    net = buildLLFormer()
    v, got = _flax_params(net, (1, 32, 32, 3))
    assert got == want, (got, want)
    y = net.apply(v, jnp.zeros((1, 32, 32, 3)))
    assert y.shape == (1, 32, 32, 3)


@pytest.mark.slow
def test_mambair_params():
    torch = pytest.importorskip("torch")
    from ref_loader import load_ref_network_module

    load_ref_network_module()  # triton stubs for einops-decorated code
    _stub_timm()  # mambaIR.py needs to_2tuple too
    if "mamba_ssm" not in sys.modules:
        # mambaIR imports the CUDA-only mamba_ssm scan symbols at module
        # level; construction/param-counting never calls them
        ms = types.ModuleType("mamba_ssm")
        ops = types.ModuleType("mamba_ssm.ops")
        ssi = types.ModuleType("mamba_ssm.ops.selective_scan_interface")
        ssi.selective_scan_fn = None
        ssi.selective_scan_ref = None
        ms.ops = ops
        ops.selective_scan_interface = ssi
        sys.modules["mamba_ssm"] = ms
        sys.modules["mamba_ssm.ops"] = ops
        sys.modules["mamba_ssm.ops.selective_scan_interface"] = ssi
    ref = _load_ref("mambaIR")
    want = _torch_count(ref.buildMambaIR())

    from bem_tpu.analysis.model_zoo import buildMambaIR

    net = buildMambaIR()
    v, got = _flax_params(net, (1, 8, 8, 3))
    assert got == want, (got, want)


def test_swinir_params():
    torch = pytest.importorskip("torch")
    ref = _load_ref("swinIR")
    want = _torch_count(ref.buildSwinIR())

    from bem_tpu.analysis.model_zoo import buildSwinIR

    net = buildSwinIR()
    v, got = _flax_params(net, (1, 8, 8, 3))
    assert got == want, (got, want)


def test_hat_params():
    torch = pytest.importorskip("torch")
    from ref_loader import load_ref_network_module

    load_ref_network_module()  # hat.py imports basicsr.utils.registry
    # hat.py expects to_2tuple/trunc_normal_ re-exported from arch_util
    # (a newer-basicsr convention the snapshot's arch_util lacks)
    layers = _stub_timm()
    au = sys.modules["basicsr.archs.arch_util"]
    au.to_2tuple = layers.to_2tuple
    au.trunc_normal_ = layers.trunc_normal_
    ref = _load_ref("hat")
    want = _torch_count(ref.HAT())

    from bem_tpu.analysis.model_zoo import buildHAT

    net = buildHAT()
    v, got = _flax_params(net, (1, 8, 8, 3))
    assert got == want, (got, want)


def test_uvmnet_mamba_formula():
    """UVMNet reference needs mamba_ssm (CUDA-only); check our Mamba1D param
    count against the documented layout instead."""
    from bem_tpu.analysis.model_zoo.uvmnet import Mamba1D

    d, N, dconv, expand = 8, 16, 4, 2
    di = expand * d
    R = -(-d // 16)
    m = Mamba1D(d, N, dconv, expand)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, d)))
    got = _param_count(v["params"])
    want = (d * 2 * di            # in_proj
            + dconv * di + di     # conv1d w + b
            + di * (R + 2 * N)    # x_proj
            + R * di + di         # dt_proj
            + di * N + di         # A_log + D
            + di * d)             # out_proj
    assert got == want, (got, want)


@pytest.mark.slow
def test_uvmnet_unet_smoke():
    """Full U-Net forward at the reference's fixed 64x64 UVMB working size
    (the channel-sequence Mamba has d_model=4096 -> multi-minute on CPU)."""
    from bem_tpu.analysis.model_zoo import buildUVMNet

    net = buildUVMNet()
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    y = net.apply(v, x)
    assert y.shape == x.shape


def test_builders_registry():
    from bem_tpu.analysis.model_zoo import BUILDERS

    assert sorted(BUILDERS) == ["EDSR", "HAT", "HWMNet", "LLFormer", "MambaIR",
                                "RCAN", "RetinexFormer", "SwinIR", "UVMNet"]
