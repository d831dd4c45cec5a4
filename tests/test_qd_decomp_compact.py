"""CompactTwoBranchModel (QD/decomp.py) parity vs the torch reference.

No checkpoint exists for this experimental variant, so the oracle is the
reference module under torch random init with weights copied across.
"""

import importlib.util
import os

import numpy as np
import pytest

REF_QD = "/root/reference/basicsr/QD"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_QD), reason="reference snapshot not available"
)


def _load_ref_module(name):
    spec = importlib.util.spec_from_file_location(
        f"ref_qd_{name}", os.path.join(REF_QD, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _conv(w):  # OIHW -> HWIO
    return np.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def _dense(w):  # (out, in) -> (in, out)
    return np.asarray(w.detach().numpy().T)


def test_compact_two_branch_matches_reference():
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from bem_tpu.qd.decomp import CompactTwoBranchModel

    torch.manual_seed(0)
    ref = _load_ref_module("decomp").CompactTwoBranchModel(
        embed_dim=32, num_heads=4
    )
    ref.eval()

    rng = np.random.default_rng(0)
    img = rng.random((2, 3, 16, 24)).astype(np.float32)
    with torch.no_grad():
        q1_ref, q2_ref = ref(torch.from_numpy(img))

    net = CompactTwoBranchModel(embed_dim=32, num_heads=4)
    img_j = jnp.asarray(img.transpose(0, 2, 3, 1))
    params = net.init(jax.random.PRNGKey(0), img_j)["params"]

    sd = ref.state_dict()
    params = jax.tree_util.tree_map(lambda x: x, params)  # unfreeze-safe copy
    params["embed"]["kernel"] = _conv(sd["embed.weight"])
    params["embed"]["bias"] = np.asarray(sd["embed.bias"])
    msef = params["msef_branch"]
    msef["layer_norm"]["scale"] = np.asarray(sd["msef_branch.layer_norm.norm.weight"])
    msef["layer_norm"]["bias"] = np.asarray(sd["msef_branch.layer_norm.norm.bias"])
    msef["depthwise_conv"]["kernel"] = _conv(sd["msef_branch.depthwise_conv.weight"])
    msef["depthwise_conv"]["bias"] = np.asarray(sd["msef_branch.depthwise_conv.bias"])
    for fc in ("fc1", "fc2"):
        msef["se_attn"][fc]["kernel"] = _dense(sd[f"msef_branch.se_attn.{fc}.weight"])
        msef["se_attn"][fc]["bias"] = np.asarray(sd[f"msef_branch.se_attn.{fc}.bias"])
    for name in ("query_dense", "key_dense", "value_dense", "combine_heads"):
        params["attn_branch"][name]["kernel"] = _dense(sd[f"attn_branch.{name}.weight"])
        params["attn_branch"][name]["bias"] = np.asarray(sd[f"attn_branch.{name}.bias"])
    params["fuse"]["kernel"] = _conv(sd["fuse.weight"])
    params["fuse"]["bias"] = np.asarray(sd["fuse.bias"])
    params["out_conv"]["kernel"] = _conv(sd["out_conv.weight"])
    params["out_conv"]["bias"] = np.asarray(sd["out_conv.bias"])

    q1, q2 = jax.jit(lambda p, x: net.apply({"params": p}, x))(params, img_j)
    np.testing.assert_allclose(
        np.asarray(q1).transpose(0, 3, 1, 2), q1_ref.numpy(), rtol=1e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(q2).transpose(0, 3, 1, 2), q2_ref.numpy(), rtol=1e-4, atol=2e-5
    )
