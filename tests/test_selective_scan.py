"""Parametric correctness grid for the scan ops.

Mirrors the reference's kernel test strategy
(kernels/selective_scan/test_selective_scan.py:372-502): forward and gradient
agreement between the fast backends and a slow independent oracle, across
dtypes / seqlens / feature sizes / option toggles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bem_tpu.ops.scan import linear_scan, selective_scan


def oracle_selective_scan(u, delta, A, B, C, D=None, delta_bias=None, delta_softplus=True):
    """Independent numpy sequential oracle (channels-last layout)."""
    u = np.asarray(u, np.float64)
    delta = np.asarray(delta, np.float64)
    A = np.asarray(A, np.float64)
    B = np.asarray(B, np.float64)
    C = np.asarray(C, np.float64)
    Bt, L, KD = u.shape
    _, _, K, N = B.shape
    Cdim = KD // K
    if delta_bias is not None:
        delta = delta + np.asarray(delta_bias, np.float64)[None, None, :]
    if delta_softplus:
        delta = np.log1p(np.exp(delta))
    h = np.zeros((Bt, KD, N))
    ys = np.zeros((Bt, L, KD))
    for t in range(L):
        a_t = np.exp(delta[:, t, :, None] * A[None])  # (Bt, KD, N)
        Bex = np.repeat(B[:, t], Cdim, axis=1)  # (Bt, KD, N)
        Cex = np.repeat(C[:, t], Cdim, axis=1)
        h = a_t * h + (delta[:, t] * u[:, t])[..., None] * Bex
        ys[:, t] = np.sum(h * Cex, axis=-1)
    if D is not None:
        ys = ys + u * np.asarray(D, np.float64)[None, None, :]
    return ys


def make_inputs(rng, Bt=2, L=64, K=2, Cdim=6, N=2, dtype=np.float32):
    KD = K * Cdim
    u = rng.standard_normal((Bt, L, KD)).astype(dtype)
    delta = (0.5 * rng.random((Bt, L, KD))).astype(dtype)
    A = (-0.5 * rng.random((KD, N))).astype(np.float32)
    B = rng.standard_normal((Bt, L, K, N)).astype(dtype)
    C = rng.standard_normal((Bt, L, K, N)).astype(dtype)
    D = rng.standard_normal((KD,)).astype(np.float32)
    delta_bias = (0.5 * rng.random((KD,))).astype(np.float32)
    return u, delta, A, B, C, D, delta_bias


@pytest.mark.parametrize("backend", ["ref", "xla", "pallas"])
@pytest.mark.parametrize("L", [8, 64, 300])
def test_linear_scan_matches_numpy(rng, backend, L):
    D = 24
    a = rng.random((2, L, D)).astype(np.float32)
    b = rng.standard_normal((2, L, D)).astype(np.float32)
    h = np.zeros((2, D))
    expect = np.zeros((2, L, D))
    for t in range(L):
        h = a[:, t] * h + b[:, t]
        expect[:, t] = h
    got = linear_scan(jnp.asarray(a), jnp.asarray(b), backend=backend)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("backend", ["ref", "xla", "pallas"])
@pytest.mark.parametrize("L", [8, 64, 300])
def test_linear_scan_reverse_matches_numpy(rng, backend, L):
    """h_t = a_t * h_{t+1} + b_t — native back-to-front walk (the pallas
    backend reverses the grid + in-block doubling; ref/xla flip around a
    forward scan). L=300 covers the non-multiple-of-LBLK tail, where the
    reverse grid walks the identity padding FIRST."""
    D = 24
    a = rng.random((2, L, D)).astype(np.float32)
    b = rng.standard_normal((2, L, D)).astype(np.float32)
    h = np.zeros((2, D))
    expect = np.zeros((2, L, D))
    for t in range(L - 1, -1, -1):
        h = a[:, t] * h + b[:, t]
        expect[:, t] = h
    got = linear_scan(jnp.asarray(a), jnp.asarray(b), backend=backend,
                      reverse=True)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_linear_scan_reverse_grads_match_ref(rng, backend, reverse):
    a = rng.random((1, 96, 16)).astype(np.float32)
    b = rng.standard_normal((1, 96, 16)).astype(np.float32)
    w = rng.standard_normal((1, 96, 16)).astype(np.float32)

    def loss(fn_backend):
        def f(a_, b_):
            return jnp.sum(
                linear_scan(a_, b_, backend=fn_backend, reverse=reverse) * w)

        return jax.grad(f, argnums=(0, 1))(jnp.asarray(a), jnp.asarray(b))

    da_ref, db_ref = loss("ref")
    da, db = loss(backend)
    np.testing.assert_allclose(np.asarray(da), np.asarray(da_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_ref), rtol=1e-4, atol=1e-4)


def test_linear_scan_reverse_narrow_lane(rng):
    """D=40 < 128 exercises the partial-lane block path (no 128-pad)."""
    a = rng.random((1, 272, 40)).astype(np.float32)
    b = rng.standard_normal((1, 272, 40)).astype(np.float32)
    for reverse in (False, True):
        ref = linear_scan(jnp.asarray(a), jnp.asarray(b), backend="ref",
                          reverse=reverse)
        got = linear_scan(jnp.asarray(a), jnp.asarray(b), backend="pallas",
                          reverse=reverse)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_linear_scan_grads_match_ref(rng, backend):
    a = rng.random((1, 96, 16)).astype(np.float32)
    b = rng.standard_normal((1, 96, 16)).astype(np.float32)
    w = rng.standard_normal((1, 96, 16)).astype(np.float32)

    def loss(fn_backend):
        def f(a_, b_):
            return jnp.sum(linear_scan(a_, b_, backend=fn_backend) * w)

        return jax.grad(f, argnums=(0, 1))(jnp.asarray(a), jnp.asarray(b))

    da_ref, db_ref = loss("ref")
    da, db = loss(backend)
    np.testing.assert_allclose(np.asarray(da), np.asarray(da_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
@pytest.mark.parametrize("L,N,with_D,with_bias,softplus", [
    (64, 1, True, True, True),      # BEM shape: d_state=1
    (100, 1, False, False, True),   # ragged L
    (64, 4, True, True, True),
    (32, 8, True, False, False),
])
def test_selective_scan_matches_oracle(rng, backend, L, N, with_D, with_bias, softplus):
    u, delta, A, B, C, D, delta_bias = make_inputs(rng, L=L, N=N)
    expect = oracle_selective_scan(
        u, delta, A, B, C,
        D if with_D else None,
        delta_bias if with_bias else None,
        softplus,
    )
    got = selective_scan(
        *map(jnp.asarray, (u, delta, A, B, C)),
        D=jnp.asarray(D) if with_D else None,
        delta_bias=jnp.asarray(delta_bias) if with_bias else None,
        delta_softplus=softplus,
        backend=backend,
    )
    # impls run fp32 vs the fp64 oracle; tolerance scales with |y|~30
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-3, atol=1e-3)


def test_selective_scan_bf16_inputs_fp32_out(rng):
    u, delta, A, B, C, D, delta_bias = make_inputs(rng, L=32, N=1)
    args = [jnp.asarray(x, jnp.bfloat16) for x in (u, delta)] + [jnp.asarray(A)] + [
        jnp.asarray(x, jnp.bfloat16) for x in (B, C)
    ]
    got = selective_scan(*args, D=jnp.asarray(D), delta_bias=jnp.asarray(delta_bias))
    assert got.dtype == jnp.float32
    expect = oracle_selective_scan(
        np.asarray(args[0], np.float32), np.asarray(args[1], np.float32), A,
        np.asarray(args[3], np.float32), np.asarray(args[4], np.float32), D, delta_bias,
    )
    np.testing.assert_allclose(np.asarray(got), expect, rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_selective_scan_grads_match_ref_backend(rng, backend):
    u, delta, A, B, C, D, delta_bias = make_inputs(rng, Bt=1, L=48, K=2, Cdim=4, N=1)
    w = rng.standard_normal((1, 48, 8)).astype(np.float32)

    def make_loss(bk):
        def f(u_, delta_, A_, B_, C_, D_, db_):
            y = selective_scan(u_, delta_, A_, B_, C_, D_, db_, True, backend=bk)
            return jnp.sum(y * w)

        return jax.grad(f, argnums=(0, 1, 2, 3, 4, 5, 6))

    args = tuple(map(jnp.asarray, (u, delta, A, B, C, D, delta_bias)))
    grads_ref = make_loss("ref")(*args)
    grads = make_loss(backend)(*args)
    names = ["du", "ddelta", "dA", "dB", "dC", "dD", "ddelta_bias"]
    for name, g, gr in zip(names, grads, grads_ref):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(gr), rtol=2e-4, atol=2e-4, err_msg=name
        )
