"""Fused CF gdMlp kernel vs the unfused composition and the NHWC module
(reference semantics: basicsr/vmamba/models/vmamba.py:116-133 gdMlp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bem_tpu.ops.gdmlp_fused import _gdmlp_ref, gdmlp_fused_cf


def _mk(B=2, C=8, H=12, W=10, seed=0, dtype=jnp.float32, bias=True):
    rng = np.random.default_rng(seed)
    h2 = 4 * C  # hidden_features = 2C -> 2h = 4C
    x = jnp.asarray(rng.standard_normal((B, C, H * W)) * 0.5, dtype)
    W1 = jnp.asarray(rng.standard_normal((h2, C)) * 0.2, jnp.float32)
    dw = jnp.asarray(rng.standard_normal((h2, 9)) * 0.2, jnp.float32)
    W2 = jnp.asarray(rng.standard_normal((C, h2 // 2)) * 0.2, jnp.float32)
    if bias:
        b1 = jnp.asarray(rng.standard_normal((h2,)) * 0.1, jnp.float32)
        bdw = jnp.asarray(rng.standard_normal((h2,)) * 0.1, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    else:
        b1 = bdw = b2 = None
    return x, W1, b1, dw, bdw, W2, b2, H, W


@pytest.mark.parametrize("bias", [True, False])
@pytest.mark.parametrize("shape", [(2, 8, 12, 10), (1, 8, 7, 130), (1, 8, 5, 3)])
def test_fused_matches_ref(shape, bias):
    B, C, H, W = shape
    args = _mk(B, C, H, W, seed=B + H, bias=bias)
    got = gdmlp_fused_cf(*args)
    exp = _gdmlp_ref(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                               rtol=2e-5, atol=2e-5)


def test_fused_bf16():
    args = _mk(2, 8, 12, 10, seed=3, dtype=jnp.bfloat16)
    got = np.asarray(gdmlp_fused_cf(*args), np.float32)
    exp = np.asarray(_gdmlp_ref(*args), np.float32)
    np.testing.assert_allclose(got, exp, rtol=3e-2, atol=3e-2)


def test_fused_grads_match_ref():
    x, W1, b1, dw, bdw, W2, b2, H, W = _mk(1, 8, 6, 9, seed=5)

    def loss_fused(x, W1, b1, dw, bdw, W2, b2):
        return jnp.sum(jnp.sin(
            gdmlp_fused_cf(x, W1, b1, dw, bdw, W2, b2, H, W)))

    def loss_ref(x, W1, b1, dw, bdw, W2, b2):
        return jnp.sum(jnp.sin(_gdmlp_ref(x, W1, b1, dw, bdw, W2, b2, H, W)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5, 6))(
        x, W1, b1, dw, bdw, W2, b2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5, 6))(
        x, W1, b1, dw, bdw, W2, b2)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_gdmlp_module_layout_parity():
    """GDMlp(layout=NCHW, fused kernel) == GDMlp(layout=NHWC, XLA convs) with
    the same parameters."""
    from bem_tpu.nn.vss import GDMlp

    rng = np.random.default_rng(7)
    B, C, H, W = 2, 8, 10, 12
    x_hw = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.5, jnp.float32)
    x_cf = jnp.transpose(x_hw, (0, 3, 1, 2))

    m_hw = GDMlp(hidden_features=2 * C, out_features=C, layout="NHWC")
    v = m_hw.init(jax.random.PRNGKey(0), x_hw)
    m_cf = GDMlp(hidden_features=2 * C, out_features=C, layout="NCHW")
    v_cf = m_cf.init(jax.random.PRNGKey(0), x_cf)
    # identical parameter trees (checkpoint compatibility)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v_cf)
    for a, b in zip(jax.tree_util.tree_leaves(v), jax.tree_util.tree_leaves(v_cf)):
        assert a.shape == b.shape

    out_hw = m_hw.apply(v, x_hw)
    out_cf = m_cf.apply(v, x_cf)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(out_cf, (0, 2, 3, 1))), np.asarray(out_hw),
        rtol=2e-5, atol=2e-5)


def test_gdmlp_module_bayesian_param_tree():
    """Bayesian GDMlp NCHW declares the same (mu/rho) tree as NHWC."""
    from bem_tpu.nn.vss import GDMlp

    x_cf = jnp.zeros((1, 8, 6, 6))
    x_hw = jnp.transpose(x_cf, (0, 2, 3, 1))
    v_cf = GDMlp(hidden_features=16, out_features=8, layout="NCHW",
                 bayesian=True).init(jax.random.PRNGKey(0), x_cf)
    v_hw = GDMlp(hidden_features=16, out_features=8, layout="NHWC",
                 bayesian=True).init(jax.random.PRNGKey(0), x_hw)
    assert (jax.tree_util.tree_structure(v_cf)
            == jax.tree_util.tree_structure(v_hw))
