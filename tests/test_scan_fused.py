"""Fused (channel-first) selective-scan kernel vs the composition oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bem_tpu.ops.scan import selective_scan
from bem_tpu.ops.scan_fused import selective_scan_fused


def make(rng, Bt=2, K=4, L=64, C=16, N=1, dtype=np.float32):
    u = rng.standard_normal((Bt, K, C, L)).astype(dtype)
    delta = (0.5 * rng.random((Bt, K, C, L))).astype(dtype)
    A = (-0.5 * rng.random((K * C, N))).astype(np.float32)
    B = rng.standard_normal((Bt, K, N, L)).astype(dtype)
    C_ = rng.standard_normal((Bt, K, N, L)).astype(dtype)
    D = rng.standard_normal((K * C,)).astype(np.float32)
    bias = (0.5 * rng.random((K * C,))).astype(np.float32)
    return u, delta, A, B, C_, D, bias


def folded_oracle(u, delta, A, B, C, D, bias):
    """Run the folded composition path on the same data (channels-last)."""
    Bt, K, Cd, L = u.shape
    # (B, K, C, L) -> (B, L, K*C)
    uf = jnp.asarray(u).transpose(0, 3, 1, 2).reshape(Bt, L, K * Cd)
    df = jnp.asarray(delta).transpose(0, 3, 1, 2).reshape(Bt, L, K * Cd)
    Bf = jnp.asarray(B).transpose(0, 3, 1, 2)  # (B, L, K, N)
    Cf = jnp.asarray(C).transpose(0, 3, 1, 2)
    args = [jnp.asarray(A), Bf, Cf]
    y = selective_scan(uf, df, *args,
                       D=None if D is None else jnp.asarray(D),
                       delta_bias=None if bias is None else jnp.asarray(bias),
                       delta_softplus=True, backend="xla")
    # back to (B, K, C, L)
    return np.asarray(y.reshape(Bt, L, K, Cd).transpose(0, 2, 3, 1))


@pytest.mark.parametrize("L,C,N", [(64, 16, 1), (100, 40, 1), (32, 8, 4)])
def test_fused_matches_composition(rng, L, C, N):
    u, delta, A, B, C_, D, bias = make(rng, L=L, C=C, N=N)
    expect = folded_oracle(u, delta, A, B, C_, D, bias)
    got = np.asarray(
        selective_scan_fused(*map(jnp.asarray, (u, delta, A, B, C_, D, bias)))
    )
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_fused_no_optionals(rng):
    u, delta, A, B, C_, _, _ = make(rng, L=32, C=8)
    got = np.asarray(selective_scan_fused(
        jnp.asarray(u), jnp.asarray(delta), jnp.asarray(A), jnp.asarray(B),
        jnp.asarray(C_), None, None))
    expect = folded_oracle(u, delta, A, B, C_, None, None)
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_fused_grads_match_composition(rng):
    u, delta, A, B, C_, D, bias = make(rng, Bt=1, L=32, C=8, N=1)
    w = rng.standard_normal((1, 4, 8, 32)).astype(np.float32)

    def loss_fused(*args):
        return jnp.sum(selective_scan_fused(*args) * w)

    def loss_ref(u_, d_, A_, B_, C2_, D_, b_):
        Bt, K, Cd, L = u_.shape
        uf = u_.transpose(0, 3, 1, 2).reshape(Bt, L, K * Cd)
        df = d_.transpose(0, 3, 1, 2).reshape(Bt, L, K * Cd)
        y = selective_scan(uf, df, A_, B_.transpose(0, 3, 1, 2),
                           C2_.transpose(0, 3, 1, 2), D_, b_, True, backend="xla")
        yk = y.reshape(Bt, L, K, Cd).transpose(0, 2, 3, 1)
        return jnp.sum(yk * w)

    args = tuple(map(jnp.asarray, (u, delta, A, B, C_, D, bias)))
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip("u delta A B C".split(), g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_ss2d_pallas_path_matches_xla_path(rng):
    """Full SS2D module: channel-first fused pipeline == channels-last path."""
    from bem_tpu.nn.ss2d import SS2D

    x = jnp.asarray(rng.standard_normal((1, 8, 12, 16)).astype(np.float32))
    net_x = SS2D(d_model=16, d_state=1, scan_backend="xla")
    v = jax.jit(net_x.init)(jax.random.PRNGKey(0), x)
    y_x = net_x.apply(v, x)
    net_p = SS2D(d_model=16, d_state=1, scan_backend="pallas")
    y_p = net_p.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                               rtol=5e-4, atol=5e-4)
