"""Parity of the fully-fused SS2D directional kernel vs the jnp oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bem_tpu.ops.ss2d_fused import ss2d_dir_fused, ss2d_dir_ref


def make(B, C, L, R, N, seed=0):
    rng = np.random.default_rng(seed)
    P = R + 2 * N
    f32 = jnp.float32
    xs2 = jnp.asarray(rng.standard_normal((B, 2, C, L)), f32)
    Wx = jnp.asarray(rng.standard_normal((4, P, C)) * 0.2, f32)
    Wdt = jnp.asarray(rng.standard_normal((4, C, R)) * 0.2, f32)
    bias = jnp.asarray(rng.standard_normal((4, C)) * 0.5, f32)
    A = jnp.asarray(-np.exp(rng.standard_normal((4, C, N)) * 0.3), f32)
    D = jnp.asarray(rng.standard_normal((4, C)), f32)
    return xs2, Wx, Wdt, bias, A, D


@pytest.mark.parametrize(
    "B,C,L,R,N",
    [
        (2, 24, 96, 3, 1),     # single padded block
        (1, 40, 1296, 3, 1),   # multi-block carry + padding (36x36)
        (2, 16, 640, 4, 2),    # N=2, exact single block
    ],
)
def test_forward_matches_oracle(B, C, L, R, N):
    args = make(B, C, L, R, N)
    y = ss2d_dir_fused(*args)
    y_ref = ss2d_dir_ref(*args)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("B,C,L,R,N", [(1, 16, 96, 3, 1), (1, 16, 1296, 3, 1),
                                       (1, 8, 640, 2, 2)])
def test_grads_match_oracle(B, C, L, R, N):
    args = make(B, C, L, R, N, seed=3)

    def loss_fused(*a):
        y = ss2d_dir_fused(*a)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_ref(*a):
        y = ss2d_dir_ref(*a)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    names = ["xs2", "Wx", "Wdt", "bias", "A", "D"]
    for name, gf, gr in zip(names, g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-3, atol=2e-3,
            err_msg=f"grad mismatch for {name}",
        )


def test_merge_equals_old_pipeline():
    """The merged y2 must equal cross_scan -> einsum -> scan -> cross_merge."""
    from bem_tpu.ops.cross_scan import cross_scan_cf, cross_merge_cf
    from bem_tpu.ops.scan import selective_scan

    B, C, H, W, R, N = 1, 12, 8, 12, 2, 1
    L = H * W
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    _, Wx, Wdt, bias, A, D = make(B, C, L, R, N, seed=7)

    # old composition (channels-last selective_scan path)
    from bem_tpu.ops.cross_scan import cross_scan, cross_merge

    xs = cross_scan(x)  # (B, 4, L, C)
    x_dbl = jnp.einsum("bklc,kpc->bklp", xs, Wx)
    dts = jnp.einsum("bklr,kcr->bklc", x_dbl[..., :R], Wdt)
    Bs = jnp.moveaxis(x_dbl[..., R : R + N], 1, 2)
    Cs = jnp.moveaxis(x_dbl[..., R + N :], 1, 2)
    u = jnp.moveaxis(xs, 1, 2).reshape(B, L, 4 * C)
    delta = jnp.moveaxis(dts, 1, 2).reshape(B, L, 4 * C)
    y_old = selective_scan(
        u, delta, A.reshape(4 * C, N), Bs, Cs, D=D.reshape(-1),
        delta_bias=bias.reshape(-1), delta_softplus=True, backend="xla",
    )
    ys_old = jnp.moveaxis(y_old.reshape(B, L, 4, C), 2, 1)
    y_merged_old = cross_merge(ys_old, H, W)  # (B, H, W, C)

    # new fused op
    xc = jnp.transpose(x, (0, 3, 1, 2))  # (B, C, H, W)
    row = xc.reshape(B, C, L)
    col = jnp.transpose(xc, (0, 1, 3, 2)).reshape(B, C, L)
    xs2 = jnp.stack([row, col], axis=1)
    y2 = ss2d_dir_fused(xs2, Wx, Wdt, bias, A, D)
    y_row = y2[:, 0].reshape(B, C, H, W)
    y_col = jnp.transpose(y2[:, 1].reshape(B, C, W, H), (0, 1, 3, 2))
    y_new = jnp.transpose(y_row + y_col, (0, 2, 3, 1))

    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_merged_old),
                               rtol=2e-4, atol=2e-4)
