"""Parity of the split per-sequence scan + fused CF tail vs composition.

Covers the round-3 serving path: ops/ss2d_seq.py (per-direction pallas
calls with in-kernel fwd/rev merge) and ops/ss2d_tail.py (merge + LN +
out_proj), plus the end-to-end SS2D layout="NCHW" fused branch against the
channels-last composition oracle with identical parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bem_tpu.ops.ss2d_seq import ss2d_seq_pair_g, _seq_pair_ref
from bem_tpu.ops.ss2d_tail import ss2d_tail_cf, _tail_ref


def make_weights(C, R, N, seed=0):
    rng = np.random.default_rng(seed)
    P = R + 2 * N
    f32 = jnp.float32
    Wx = jnp.asarray(rng.standard_normal((4, P, C)) * 0.2, f32)
    Wdt = jnp.asarray(rng.standard_normal((4, C, R)) * 0.2, f32)
    bias = jnp.asarray(rng.standard_normal((4, C)) * 0.5, f32)
    A = jnp.asarray(-np.exp(rng.standard_normal((4, C, N)) * 0.3), f32)
    D = jnp.asarray(rng.standard_normal((4, C)), f32)
    return Wx, Wdt, bias, A, D


@pytest.mark.parametrize("pair", ["row", "col"])
@pytest.mark.parametrize(
    "B,C,L,R,N,G",
    [
        (2, 24, 96, 3, 1, 2),    # grouped, single padded block
        (1, 40, 1296, 3, 1, 1),  # multi-block carry + padding
        (2, 16, 640, 4, 2, 2),   # N=2, exact block
    ],
)
def test_seq_pair_matches_oracle(B, C, L, R, N, G, pair):
    rng = np.random.default_rng(1)
    Wx, Wdt, bias, A, D = make_weights(C, R, N)
    x = jnp.asarray(rng.standard_normal((B, C, L)), jnp.float32)
    xg = x.reshape(B // G, G * C, L)
    y = ss2d_seq_pair_g(xg, Wx, Wdt, bias, A, D, G, pair)
    from bem_tpu.ops.ss2d_seq import PAIRS

    d_f, d_r = PAIRS[pair]
    y_ref = _seq_pair_ref(x, Wx, Wdt, bias, A, D, d_f, d_r)
    np.testing.assert_allclose(
        np.asarray(y).reshape(B, C, L), np.asarray(y_ref),
        rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize(
    "B,C,H,W,R,N,G",
    [
        (2, 24, 12, 16, 3, 1, 2),   # whole-image block (H*W <= 4096)
        (1, 40, 40, 128, 3, 1, 1),  # multi-slab carry: th=8, nH=5
        (2, 16, 8, 640, 3, 1, 2),   # th=2 slabs at an L0-like W
        (2, 16, 16, 128, 4, 2, 2),  # N=2 state carry
    ],
)
def test_col_pair_matches_transposed_oracle(B, C, H, W, R, N, G):
    """Transpose-free col kernel == transpose -> col-major composition ->
    transpose back (the path it replaces)."""
    from bem_tpu.ops.ss2d_seq import col_pair_supported, ss2d_col_pair_g

    assert col_pair_supported(H, W)
    L = H * W
    rng = np.random.default_rng(7)
    Wx, Wdt, bias, A, D = make_weights(C, R, N, seed=7)
    x = jnp.asarray(rng.standard_normal((B, C, L)), jnp.float32)
    xg = x.reshape(B // G, G * C, L)
    y = np.asarray(ss2d_col_pair_g(xg, Wx, Wdt, bias, A, D, None, G, H, W))
    xT = jnp.transpose(x.reshape(B, C, H, W), (0, 1, 3, 2)).reshape(B, C, L)
    yT = _seq_pair_ref(xT, Wx, Wdt, bias, A, D, 1, 3)
    y_ref = jnp.transpose(
        yT.reshape(B, C, W, H), (0, 1, 3, 2)).reshape(B, C, L)
    np.testing.assert_allclose(
        y.reshape(B, C, L), np.asarray(y_ref), rtol=2e-4, atol=2e-4)
    # y0 merge: the row-pair output rides into the first full-scan pass
    y0 = jnp.asarray(rng.standard_normal(xg.shape), jnp.float32)
    ym = np.asarray(ss2d_col_pair_g(xg, Wx, Wdt, bias, A, D, y0, G, H, W))
    np.testing.assert_allclose(
        ym.reshape(B, C, L),
        np.asarray(y_ref) + np.asarray(y0).reshape(B, C, L),
        rtol=2e-4, atol=2e-4)


def test_col_pair_grads_match_oracle():
    from bem_tpu.ops.ss2d_seq import ss2d_col_pair_g

    B, C, H, W, R, N, G = 2, 16, 8, 16, 3, 1, 2
    L = H * W
    rng = np.random.default_rng(9)
    Wx, Wdt, bias, A, D = make_weights(C, R, N, seed=9)
    xg = jnp.asarray(rng.standard_normal((B // G, G * C, L)), jnp.float32)

    def loss_fused(*a):
        return jnp.sum(
            ss2d_col_pair_g(*a, None, G, H, W).astype(jnp.float32) ** 2)

    def loss_ref(xgg, *w):
        x = xgg.reshape(B, C, L)
        xT = jnp.transpose(
            x.reshape(B, C, H, W), (0, 1, 3, 2)).reshape(B, C, L)
        yT = _seq_pair_ref(xT, *w, 1, 3)
        return jnp.sum(yT.astype(jnp.float32) ** 2)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(6)))(xg, Wx, Wdt, bias, A, D)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(xg, Wx, Wdt, bias, A, D)
    for name, gf, gr in zip(["x", "Wx", "Wdt", "bias", "A", "D"], g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_seq_pair_grads_match_oracle():
    B, C, L, R, N, G = 2, 16, 96, 3, 1, 2
    rng = np.random.default_rng(3)
    Wx, Wdt, bias, A, D = make_weights(C, R, N, seed=3)
    xg = jnp.asarray(rng.standard_normal((B // G, G * C, L)), jnp.float32)

    def loss_fused(*a):
        return jnp.sum(ss2d_seq_pair_g(*a, G, "row").astype(jnp.float32) ** 2)

    def loss_ref(xgg, *w):
        x = xgg.reshape(B, C, L)
        y = _seq_pair_ref(x, *w, 0, 2)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(6)))(xg, Wx, Wdt, bias, A, D)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(xg, Wx, Wdt, bias, A, D)
    for name, gf, gr in zip(["x", "Wx", "Wdt", "bias", "A", "D"], g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


@pytest.mark.parametrize("G,use_bias,merged",
                         [(1, False, False), (2, False, False),
                          (2, True, False), (2, False, True)])
def test_tail_matches_ref(G, use_bias, merged):
    B, C, Cout, L = 4, 24, 24, 96
    rng = np.random.default_rng(5)
    yr = jnp.asarray(rng.standard_normal((B // G, G * C, L)), jnp.bfloat16)
    # merged=True: the col pair already folded the row output into yr and
    # the tail consumes ONE stream (y_colT=None)
    yc = None if merged else jnp.asarray(
        rng.standard_normal((B // G, G * C, L)), jnp.bfloat16)
    sc = jnp.asarray(rng.standard_normal(C) * 0.2 + 1.0, jnp.float32)
    bi = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    W = jnp.asarray(rng.standard_normal((C, Cout)) * 0.2, jnp.float32)
    bo = jnp.asarray(rng.standard_normal(Cout) * 0.1, jnp.float32) if use_bias else None
    out = ss2d_tail_cf(yr, yc, sc, bi, W, bo, G)
    ref = _tail_ref(yr, yc, sc, bi, W, bo, G)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)


def test_ss2d_cf_fused_matches_nhwc_composition():
    """SS2D layout='NCHW' (fused seq+tail branch) == layout NHWC composition
    with the same params — the end-to-end check for the serving path."""
    from bem_tpu.nn.ss2d import SS2D

    B, H, W, C = 2, 12, 16, 16
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)

    kw = dict(d_model=C, d_state=1, ssm_ratio=1.0, dt_rank="auto",
              forward_type="v05_noz")
    m_ref = SS2D(scan_backend="xla", layout="NHWC", **kw)
    m_cf = SS2D(scan_backend="pallas", layout="NCHW", **kw)
    v = m_ref.init(jax.random.PRNGKey(0), x)
    y_ref = m_ref.apply(v, x)
    x_cf = jnp.transpose(x, (0, 3, 1, 2))
    y_cf = m_cf.apply(v, x_cf)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(y_cf, (0, 2, 3, 1))), np.asarray(y_ref),
        rtol=5e-4, atol=5e-4)


def test_vssblock_cf_fused_matches_nhwc():
    """Full VSSBlock in layout='NCHW' with the fused pallas branch vs NHWC."""
    from bem_tpu.nn.vss import VSSBlock

    B, H, W, C = 2, 8, 12, 16
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    kw = dict(hidden_dim=C, forward_type="v05_noz", mlp_ratio=4.0,
              mlp_type="gdmlp")
    m_ref = VSSBlock(scan_backend="xla", layout="NHWC", **kw)
    m_cf = VSSBlock(scan_backend="pallas", layout="NCHW", **kw)
    v = m_ref.init(jax.random.PRNGKey(0), x)
    y_ref = m_ref.apply(v, x)
    y_cf = m_cf.apply(v, jnp.transpose(x, (0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(y_cf, (0, 2, 3, 1))), np.asarray(y_ref),
        rtol=1e-3, atol=1e-3)
