"""SS2Dm0 (mamba2/SSD) and SS2Dv0 forward types: smoke + golden parity vs
the reference torch SS2D (vmamba.py:293-436 v0, :967-1157 m0)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bem_tpu.nn.ss2d import SS2D

REF = "/root/reference"


def test_m0_smoke(rng):
    x = jnp.asarray(rng.standard_normal((1, 6, 10, 16)).astype(np.float32))
    net = SS2D(d_model=16, d_state=8, ssm_ratio=1.0, forward_type="m0",
               initialize="v2", conv_bias=False)
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    y = net.apply(v, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_m0_initial_state_carries(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 16)).astype(np.float32))
    net = SS2D(d_model=16, d_state=4, ssm_ratio=1.0, forward_type="m0",
               initialize="v2", with_initial_state=True)
    v = net.init(jax.random.PRNGKey(0), x)
    assert "ssm_state" in v
    y1, mut = net.apply(v, x, mutable=["ssm_state"])
    s = mut["ssm_state"]["initial_state"]
    assert np.abs(np.asarray(s)).max() > 0  # state was written
    # a second call with the carried state changes the output
    y2 = net.apply({"params": v["params"], **mut}, x)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_m0_matches_reference(rng):
    import torch

    from ref_loader import load_ref_network_module

    load_ref_network_module()
    vmamba = sys.modules["basicsr.vmamba.models.vmamba"]

    torch.manual_seed(0)
    ref = vmamba.SS2D(
        d_model=16, d_state=8, ssm_ratio=1.0, dt_rank="auto", d_conv=3,
        conv_bias=False, forward_type="m0", channel_first=False,
        initialize="v2",
    )
    # reference latent bug: __initm0__ never sets channel_first but
    # forwardm0 reads it (vmamba.py:1144)
    ref.channel_first = False
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from bem_tpu.archs.convert_network import _Mapper, _convert_ss2d
    from bem_tpu.utils.torch_convert import assemble

    m = _Mapper({f"op.{k}": v for k, v in sd.items()})
    _convert_ss2d(m, "ss", "op")
    params = assemble({k[3:]: v for k, v in m.out.items()})

    x = rng.standard_normal((2, 6, 10, 16)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()

    net = SS2D(d_model=16, d_state=8, ssm_ratio=1.0, d_conv=3,
               conv_bias=False, forward_type="m0", initialize="v2")
    out = np.asarray(net.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, out_ref, rtol=2e-4, atol=2e-4)


def test_v0_smoke(rng):
    x = jnp.asarray(rng.standard_normal((1, 6, 10, 16)).astype(np.float32))
    net = SS2D(d_model=16, d_state=4, ssm_ratio=2.0, forward_type="v0",
               conv_bias=True, scan_backend="xla")
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    y = net.apply(v, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_v0_matches_reference(rng):
    import torch

    from ref_loader import load_ref_network_module

    load_ref_network_module()
    vmamba = sys.modules["basicsr.vmamba.models.vmamba"]

    torch.manual_seed(0)
    ref = vmamba.SS2D(
        d_model=16, d_state=4, ssm_ratio=2.0, dt_rank="auto", d_conv=3,
        conv_bias=True, forward_type="v0", channel_first=False,
    )
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from bem_tpu.archs.convert_network import _Mapper, _convert_ss2d
    from bem_tpu.utils.torch_convert import assemble

    m = _Mapper({f"op.{k}": v for k, v in sd.items()})
    _convert_ss2d(m, "ss", "op")
    params = assemble({k[3:]: v for k, v in m.out.items()})

    x = rng.standard_normal((2, 6, 10, 16)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()

    net = SS2D(d_model=16, d_state=4, ssm_ratio=2.0, d_conv=3,
               conv_bias=True, forward_type="v0", scan_backend="xla")
    out = np.asarray(net.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, out_ref, rtol=2e-4, atol=2e-4)
