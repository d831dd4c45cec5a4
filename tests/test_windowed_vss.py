"""Windowed VSSBlock (grid_size) golden parity vs the reference's
_forwardv02 (vmamba.py:1336-1371) — VERDICT round-1 weak item 8: the
windowed path existed but was never tested at scale. 64x64 with 8x8
windows (64 windows) plus a non-divisible size exercising the pad/crop
branch."""

import numpy as np
import pytest

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_vmamba():
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from ref_loader import load_ref_network_module

    load_ref_network_module()
    return sys.modules["basicsr.vmamba.models.vmamba"]


@pytest.mark.parametrize("hw", [(64, 64), (20, 28)])
def test_windowed_vssblock_matches_reference(ref_vmamba, rng, hw):
    torch = pytest.importorskip("torch")

    import jax
    import jax.numpy as jnp

    from bem_tpu.archs.convert_network import _Mapper, _convert_ss2d, assemble
    from bem_tpu.nn.vss import VSSBlock

    H, W = hw
    C = 16
    torch.manual_seed(0)
    blk_t = ref_vmamba.VSSBlock(
        hidden_dim=C, drop_path=0.0,
        norm_layer=ref_vmamba.LayerNorm2d,
        ssm_d_state=1, ssm_ratio=1.0,
        ssm_dt_rank="auto", ssm_conv=3, ssm_conv_bias=False,
        forward_type="v05_noz", mlp_ratio=2.0, mlp_type="mlp",
        use_checkpoint=False, channel_first=True, grid_size=8,
    )
    blk_t.eval()
    sd = {k: v.detach().numpy() for k, v in blk_t.state_dict().items()}

    m = _Mapper(sd)
    m.ln("blk/norm", "norm")
    m.ln("blk/norm2", "norm2")
    _convert_ss2d(m, "blk/op", "op")
    # mlp: reference Mlp (fc1/fc2 Linear2d) at gmlp=False mlp_ratio=2
    m.linear("blk/mlp/fc1", "mlp.fc1")
    m.linear("blk/mlp/fc2", "mlp.fc2")
    params = assemble(m.out)["blk"]

    x = rng.standard_normal((1, H, W, C)).astype(np.float32) * 0.4
    with torch.no_grad():
        yt = blk_t.forward(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    yt = yt.numpy().transpose(0, 2, 3, 1)

    blk_j = VSSBlock(hidden_dim=C, ssm_d_state=1, ssm_ratio=1.0,
                     forward_type="v05_noz", mlp_ratio=2.0, mlp_type="mlp",
                     grid_size=8, scan_backend="xla")
    yj = np.asarray(blk_j.apply({"params": params}, jnp.asarray(x)))

    np.testing.assert_allclose(yj, yt, rtol=2e-4, atol=2e-5)
