"""Golden parity: flax Network vs the reference torch Network with converted
weights (the vmamba_checks.py pattern, SURVEY §4.4)."""

import os

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference snapshot unavailable"
)


@pytest.fixture(scope="module")
def ref_unet():
    from ref_loader import load_ref_network_module

    return load_ref_network_module()


@pytest.mark.parametrize("use_pixelshuffle", [True, False])
def test_network_matches_reference(ref_unet, use_pixelshuffle):
    import torch

    import jax
    import jax.numpy as jnp

    from bem_tpu.archs import build_network
    from bem_tpu.archs.convert_network import convert_network_state

    torch.manual_seed(0)
    kwargs = dict(
        in_channels=3, out_channels=3, n_feat=8, stage=1,
        num_blocks=[1, 1], d_state=[1, 1], ssm_ratio=1, mlp_ratio=2,
        mlp_type="gdmlp", use_pixelshuffle=use_pixelshuffle,
    )
    ref = ref_unet.Network(**kwargs)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rng = np.random.default_rng(0)
    x = rng.random((1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x))[-1].numpy()

    params = convert_network_state(sd, num_blocks=(1, 1), stage=1,
                                   use_pixelshuffle=use_pixelshuffle)
    net = build_network(dict(type="Network", **kwargs))
    x_j = jnp.asarray(x.transpose(0, 2, 3, 1))
    out = jax.jit(
        lambda p, t: net.apply({"params": p}, t)[-1]
    )(params, x_j)
    out = np.asarray(out).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(out, out_ref, rtol=2e-3, atol=2e-4)


def test_network_bayesian_checkpoint_roundtrip(ref_unet):
    """Convert a BNN-converted torch Network (mu/rho params) and check the
    deterministic forward (mu weights) matches torch's deterministic mode."""
    import torch

    import jax
    import jax.numpy as jnp

    from bem_tpu.archs import build_network
    from bem_tpu.archs.convert_network import convert_network_state
    from ref_loader import _exec

    # load the reference bayesian layer package (relative imports intact)
    import importlib
    import sys, types

    if "ref_bayes" not in sys.modules:
        pkg = types.ModuleType("ref_bayes")
        pkg.__path__ = [f"{REF}/basicsr/bayesian"]
        sys.modules["ref_bayes"] = pkg
    conv_mod = importlib.import_module("ref_bayes.conv")
    lin_mod = importlib.import_module("ref_bayes.linear")

    torch.manual_seed(0)
    kwargs = dict(in_channels=3, out_channels=3, n_feat=8, stage=1,
                  num_blocks=[1, 1], d_state=[1, 1], ssm_ratio=1, mlp_ratio=2,
                  mlp_type="gdmlp", use_pixelshuffle=True)
    ref = ref_unet.Network(**kwargs)

    def convert(m):
        import torch.nn as tnn

        for name, child in list(m._modules.items()):
            if child is None:
                continue
            if child._modules:
                convert(child)
            elif "Linear" in type(child).__name__:
                layer = getattr(
                    lin_mod, type(child).__name__ + "Reparameterization"
                )(in_features=child.in_features, out_features=child.out_features,
                  bias=child.bias is not None)
                setattr(m, name, layer)
            elif "Conv" in type(child).__name__:
                layer = conv_mod.Conv2dReparameterization(
                    in_channels=child.in_channels,
                    out_channels=child.out_channels,
                    kernel_size=child.kernel_size,
                    stride=child.stride, padding=child.padding,
                    dilation=child.dilation, groups=child.groups,
                    bias=child.bias is not None)
                setattr(m, name, layer)

    for module in ref.modules():
        if getattr(module, "bayesian", False):
            convert(module)
    # deterministic mode
    for module in ref.modules():
        if hasattr(module, "deterministic"):
            module.deterministic = True
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_network_state(sd, num_blocks=(1, 1), stage=1)

    rng = np.random.default_rng(1)
    x = rng.random((1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x))[-1].numpy()

    net = build_network(dict(type="Network", bayesian=True, **kwargs))
    out = jax.jit(lambda p, t: net.apply({"params": p}, t)[-1])(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    # BNN kaiming init produces larger activations than the deterministic
    # test's trunc_normal(0.02); fp32 accumulation differences scale with it
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), out_ref, rtol=5e-3, atol=3e-3
    )
