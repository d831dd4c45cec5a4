"""Grouped fused SS2D kernel (ops/ss2d_fused_g.py): parity vs the jnp
oracle and the ungrouped kernel, plus gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bem_tpu.ops.ss2d_fused import ss2d_dir_fused, ss2d_dir_ref
from bem_tpu.ops.ss2d_fused_g import pick_group, ss2d_dir_fused_g


def _inputs(B=4, C=6, H=8, W=12, N=1, R=2, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    L = H * W
    P = R + 2 * N
    xs2 = jnp.asarray(rng.standard_normal((B, 2, C, L)) * 0.5, dtype)
    Wx = jnp.asarray(rng.standard_normal((4, P, C)) * 0.2, jnp.float32)
    Wdt = jnp.asarray(rng.standard_normal((4, C, R)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((4, C)) * 0.1, jnp.float32)
    A = jnp.asarray(-np.exp(rng.standard_normal((4, C, N)) * 0.2), jnp.float32)
    D = jnp.asarray(rng.standard_normal((4, C)), jnp.float32)
    return xs2, Wx, Wdt, bias, A, D


def _group(xs2, G):
    B, S, C, L = xs2.shape
    Bg = B // G
    x = jnp.moveaxis(xs2.reshape(Bg, G, S, C, L), 1, 2)
    return x.reshape(Bg, S, G * C, L)


def _ungroup(y2g, G):
    Bg, S, GC, L = y2g.shape
    C = GC // G
    y = jnp.moveaxis(y2g.reshape(Bg, S, G, C, L), 2, 1)
    return y.reshape(Bg * G, S, C, L)


@pytest.mark.parametrize("G", [2, 4])
@pytest.mark.parametrize("N", [1, 2])
def test_grouped_matches_oracle(G, N):
    xs2, Wx, Wdt, bias, A, D = _inputs(B=4, N=N)
    want = np.asarray(ss2d_dir_ref(xs2, Wx, Wdt, bias, A, D))
    got = np.asarray(_ungroup(
        ss2d_dir_fused_g(_group(xs2, G), Wx, Wdt, bias, A, D, G), G))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_grouped_matches_ungrouped():
    xs2, Wx, Wdt, bias, A, D = _inputs(B=4, H=16, W=8)
    a = np.asarray(ss2d_dir_fused(xs2, Wx, Wdt, bias, A, D))
    b = np.asarray(_ungroup(
        ss2d_dir_fused_g(_group(xs2, 4), Wx, Wdt, bias, A, D, 4), 4))
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-4)


def test_grouped_long_block_boundaries():
    """L larger than one lane block exercises the carried state."""
    xs2, Wx, Wdt, bias, A, D = _inputs(B=2, C=4, H=40, W=40)  # L=1600 > 1024
    want = np.asarray(ss2d_dir_ref(xs2, Wx, Wdt, bias, A, D))
    got = np.asarray(_ungroup(
        ss2d_dir_fused_g(_group(xs2, 2), Wx, Wdt, bias, A, D, 2), 2))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_grouped_grads_match_oracle():
    xs2, Wx, Wdt, bias, A, D = _inputs(B=2, C=4, H=6, W=6)
    G = 2

    def f_ref(xs2, Wx, Wdt, bias, A, D):
        return jnp.sum(ss2d_dir_ref(xs2, Wx, Wdt, bias, A, D) ** 2)

    def f_g(xs2, Wx, Wdt, bias, A, D):
        y = ss2d_dir_fused_g(_group(xs2, G), Wx, Wdt, bias, A, D, G)
        return jnp.sum(_ungroup(y, G) ** 2)

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4, 5))(xs2, Wx, Wdt, bias, A, D)
    g_got = jax.grad(f_g, argnums=(0, 1, 2, 3, 4, 5))(xs2, Wx, Wdt, bias, A, D)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_pick_group():
    assert pick_group(16, 40) == 4   # 8*40=320 > 256
    assert pick_group(16, 80) == 2
    assert pick_group(16, 160) == 1
    assert pick_group(3, 40) == 1    # no divisor
    assert pick_group(8, 16) == 8
