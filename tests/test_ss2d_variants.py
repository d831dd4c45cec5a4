"""SS2D forward_type variants incl. golden parity for cascade2d."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bem_tpu.nn.ss2d import SS2D

REF = "/root/reference"


@pytest.mark.parametrize("ftype", ["v05_noz", "v05", "v051d_noz", "v052d_noz",
                                   "v052dc_noz", "v05_noz_onsigmoid"])
def test_ss2d_variants_forward(rng, ftype):
    x = jnp.asarray(rng.standard_normal((1, 6, 10, 16)).astype(np.float32))
    net = SS2D(d_model=16, d_state=1, forward_type=ftype, scan_backend="xla")
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    y = net.apply(v, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
@pytest.mark.parametrize("ftype", ["v05_noz", "v052dc_noz"])
def test_ss2d_matches_reference(rng, ftype):
    """Golden parity vs reference SS2D (torch-backend selective scan)."""
    import torch

    from ref_loader import load_ref_network_module
    import sys

    load_ref_network_module()  # sets up basicsr.vmamba.models.vmamba
    vmamba = sys.modules["basicsr.vmamba.models.vmamba"]

    torch.manual_seed(0)
    ref = vmamba.SS2D(
        d_model=16, d_state=1, ssm_ratio=1.0, dt_rank="auto", d_conv=3,
        conv_bias=False, forward_type=ftype, channel_first=True,
    )
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from bem_tpu.archs.convert_network import _Mapper, _convert_ss2d
    from bem_tpu.utils.torch_convert import assemble

    m = _Mapper({f"op.{k}": v for k, v in sd.items()})
    _convert_ss2d(m, "ss", "op")
    # strip the leading "ss/" scope
    params = assemble({k[3:]: v for k, v in m.out.items()})

    x = rng.standard_normal((1, 16, 6, 10)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()

    net = SS2D(d_model=16, d_state=1, ssm_ratio=1.0, d_conv=3,
               conv_bias=False, forward_type=ftype, scan_backend="xla")
    out = net.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), out_ref, rtol=2e-3, atol=2e-4
    )
