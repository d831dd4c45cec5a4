"""QD decomposition: golden parity against the reference torch checkpoints.

Loads the reference Decomp (torch CPU) and our flax Decomp with converted
weights, and asserts the (Q1, Q2) outputs match. Skipped when the reference
snapshot is not mounted.
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


@pytest.mark.parametrize("model_type", ["model1", "model2", "model3", "model4"])
def test_decomp_matches_reference(model_type):
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from bem_tpu.qd.convert import convert_checkpoint
    from bem_tpu.qd.models import Decomp

    ckpt = os.path.join(REF_QD, "checkpoints", f"{model_type}_999.pth")
    ref_mod = _load_ref_module(model_type)
    ref = ref_mod.Decomp(use_wavelets=True)
    sd = torch.load(ckpt, map_location="cpu", weights_only=False)["model_state_dict"]
    ref.load_state_dict(sd)
    ref.eval()

    rng = np.random.default_rng(0)
    img = rng.random((1, 3, 16, 24)).astype(np.float32)
    with torch.no_grad():
        q1_ref, q2_ref = ref(torch.from_numpy(img))

    params = convert_checkpoint(ckpt, model_type)
    net = Decomp(model_type=model_type)
    img_j = jnp.asarray(img.transpose(0, 2, 3, 1))
    q1, q2 = jax.jit(lambda p, x: net.apply({"params": p}, x))(params, img_j)

    np.testing.assert_allclose(
        np.asarray(q1).transpose(0, 3, 1, 2), q1_ref.numpy(), rtol=1e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(q2).transpose(0, 3, 1, 2), q2_ref.numpy(), rtol=1e-4, atol=2e-4
    )


def test_decomp_wavelet_features_match_arch_path():
    """wavelet_features == the MyDecomp stop-before-IWT forward
    (DecompDualBranchDDWavelet_arch.py:80-132): IWT(recombined) must equal
    the full __call__ without PostSmooth."""
    import jax
    import jax.numpy as jnp

    from bem_tpu.ops.wavelet import iwt2
    from bem_tpu.qd.models import Decomp, Q1_W_INDICES, Q2_W_INDICES

    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    net = Decomp(model_type="model1")
    params = net.init(jax.random.PRNGKey(0), img)["params"]

    q1_w, q2_w = jax.jit(
        lambda p, x: net.apply({"params": p}, x, method=Decomp.wavelet_features)
    )(params, img)
    assert q1_w.shape == (1, 4, 4, 16)

    # recombine into the 32-channel wavelet tensor and invert
    out = np.zeros((1, 4, 4, 32), np.float32)
    out[..., list(Q1_W_INDICES)] = np.asarray(q1_w)
    out[..., list(Q2_W_INDICES)] = np.asarray(q2_w)
    q_full = np.asarray(iwt2(jnp.asarray(out)))
    q1_full = q_full[..., (0, 2, 4, 6)]
    q2_full = q_full[..., (1, 3, 5, 7)]

    q1, q2 = jax.jit(lambda p, x: net.apply({"params": p}, x))(params, img)  # model1: no PostSmooth
    np.testing.assert_allclose(q1_full, np.asarray(q1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(q2_full, np.asarray(q2), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("model_type", ["model1", "model4"])
def test_decomp_retrain_checkpoints_match_reference(model_type):
    """The *_retrain_999 drops (QD/checkpoints/) converted and shipped; same
    arch, different weights — spot-check torch parity on two of them."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from bem_tpu.qd.convert import CHECKPOINT_DIR, load_decomp_params
    from bem_tpu.qd.models import Decomp

    if not os.path.exists(
            os.path.join(CHECKPOINT_DIR, f"{model_type}_retrain_999.msgpack")):
        pytest.skip("retrain checkpoint not converted")
    ckpt = os.path.join(REF_QD, "checkpoints", f"{model_type}_retrain_999.pth")
    ref_mod = _load_ref_module(model_type)
    ref = ref_mod.Decomp(use_wavelets=True)
    sd = torch.load(ckpt, map_location="cpu",
                    weights_only=False)["model_state_dict"]
    ref.load_state_dict(sd)
    ref.eval()

    rng = np.random.default_rng(2)
    img = rng.random((1, 3, 16, 24)).astype(np.float32)
    with torch.no_grad():
        q1_ref, q2_ref = ref(torch.from_numpy(img))

    params = load_decomp_params(f"{model_type}_retrain")
    net = Decomp(model_type=model_type)
    img_j = jnp.asarray(img.transpose(0, 2, 3, 1))
    q1, q2 = jax.jit(lambda p, x: net.apply({"params": p}, x))(params, img_j)
    np.testing.assert_allclose(np.asarray(q1).transpose(0, 3, 1, 2),
                               q1_ref.numpy(), rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(q2).transpose(0, 3, 1, 2),
                               q2_ref.numpy(), rtol=1e-4, atol=2e-4)
