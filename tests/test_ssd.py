"""SSD (mamba2) chunked scan: golden parity vs the reference torch spec
(basicsr/vmamba/models/mamba2/ssd_minimal.py) plus self-consistency checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bem_tpu.ops.ssd import segsum, ssd_chunk_scan, ssd_chunked

torch = pytest.importorskip("torch")

from ref_loader import _exec  # noqa: E402

REF_SSD = "/root/reference/basicsr/vmamba/models/mamba2/ssd_minimal.py"


@pytest.fixture(scope="module")
def ref():
    # hide any triton stub other tests installed (ref_loader's): with a
    # fake triton importable, ssd_minimal sets WITH_TRITON=True and dies
    # importing its kernel siblings
    import sys

    saved = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k == "triton" or k.startswith("triton.")}
    try:
        return _exec(REF_SSD, "ref_ssd_minimal")
    finally:
        sys.modules.update(saved)


def _rand(*shape, seed=0, scale=1.0):
    return (np.random.default_rng(seed).standard_normal(shape) * scale).astype(
        np.float32
    )


def test_segsum_matches_reference(ref):
    x = _rand(2, 3, 8, seed=1)
    got = np.asarray(segsum(jnp.asarray(x)))
    want = ref.segsum(torch.from_numpy(x)).numpy()
    # both use -inf off-triangle
    tri = np.tril(np.ones((8, 8), bool))
    np.testing.assert_allclose(got[..., tri], want[..., tri], rtol=1e-5, atol=1e-5)
    assert np.all(np.isneginf(got[..., ~tri]))


@pytest.mark.parametrize("chunk", [4, 8, 16])
@pytest.mark.parametrize("L", [32, 48])
def test_ssd_discrete_parity(ref, chunk, L):
    B, H, P, N = 2, 3, 4, 2
    if L % chunk:
        pytest.skip("chunk must divide L for the discrete core")
    u = _rand(B, L, H, P, seed=2, scale=0.5)
    w = -np.abs(_rand(B, L, H, seed=3, scale=0.3))
    Bm = _rand(B, L, H, N, seed=4, scale=0.5)
    Cm = _rand(B, L, H, N, seed=5, scale=0.5)

    y, state = ssd_chunked(
        jnp.asarray(u), jnp.asarray(w), jnp.asarray(Bm), jnp.asarray(Cm), chunk
    )
    yt, st = ref.ssd_minimal_discrete(
        torch.from_numpy(u), torch.from_numpy(w),
        torch.from_numpy(Bm), torch.from_numpy(Cm), block_len=chunk,
    )
    np.testing.assert_allclose(np.asarray(y), yt.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(state), st.numpy(), rtol=2e-4, atol=2e-4)


def test_chunk_invariance():
    """Different chunk sizes give identical results (state passing correct)."""
    B, L, H, P, N = 1, 64, 2, 3, 2
    u = _rand(B, L, H, P, seed=6, scale=0.5)
    w = -np.abs(_rand(B, L, H, seed=7, scale=0.3))
    Bm = _rand(B, L, H, N, seed=8, scale=0.5)
    Cm = _rand(B, L, H, N, seed=9, scale=0.5)
    outs = [
        np.asarray(ssd_chunked(jnp.asarray(u), jnp.asarray(w),
                               jnp.asarray(Bm), jnp.asarray(Cm), c)[0])
        for c in (4, 16, 64)
    ]
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(outs[0], outs[2], rtol=1e-5, atol=1e-5)


def test_combined_parity_full(ref):
    """mamba_chunk_scan_combined: dt bias + softplus + D + z + groups."""
    B, L, H, P, G, N = 2, 32, 4, 3, 2, 2
    x = _rand(B, L, H, P, seed=10, scale=0.5)
    dt = _rand(B, L, H, seed=11, scale=0.5) - 2.0
    A = -np.abs(_rand(H, seed=12, scale=0.5)) - 0.1
    Bm = _rand(B, L, G, N, seed=13, scale=0.5)
    Cm = _rand(B, L, G, N, seed=14, scale=0.5)
    D = _rand(H, seed=15)
    z = _rand(B, L, H, P, seed=16, scale=0.5)
    dt_bias = _rand(H, seed=17, scale=0.1)

    got, gstate = ssd_chunk_scan(
        jnp.asarray(x), jnp.asarray(dt), jnp.asarray(A), jnp.asarray(Bm),
        jnp.asarray(Cm), chunk_size=8, D=jnp.asarray(D), z=jnp.asarray(z),
        dt_bias=jnp.asarray(dt_bias), dt_softplus=True,
        return_final_states=True,
    )
    want, wstate = ref.mamba_chunk_scan_combined_torch(
        torch.from_numpy(x), torch.from_numpy(dt), torch.from_numpy(A),
        torch.from_numpy(Bm), torch.from_numpy(Cm), chunk_size=8,
        D=torch.from_numpy(D), z=torch.from_numpy(z),
        dt_bias=torch.from_numpy(dt_bias), dt_softplus=True,
        return_final_states=True,
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(gstate), wstate.numpy(), rtol=3e-4,
                               atol=3e-4)


def test_initial_state_continuation():
    """Scanning [a; b] equals scanning a then b with carried state."""
    B, L, H, P, N = 1, 32, 2, 3, 2
    x = _rand(B, L, H, P, seed=20, scale=0.5)
    dt = np.abs(_rand(B, L, H, seed=21, scale=0.3)) + 0.1
    A = -np.abs(_rand(H, seed=22, scale=0.5)) - 0.1
    Bm = _rand(B, L, H, N, seed=23, scale=0.5)
    Cm = _rand(B, L, H, N, seed=24, scale=0.5)

    full, fstate = ssd_chunk_scan(
        jnp.asarray(x), jnp.asarray(dt), jnp.asarray(A), jnp.asarray(Bm),
        jnp.asarray(Cm), chunk_size=8, return_final_states=True)
    h = L // 2
    y1, s1 = ssd_chunk_scan(
        jnp.asarray(x[:, :h]), jnp.asarray(dt[:, :h]), jnp.asarray(A),
        jnp.asarray(Bm[:, :h]), jnp.asarray(Cm[:, :h]), chunk_size=8,
        return_final_states=True)
    y2, s2 = ssd_chunk_scan(
        jnp.asarray(x[:, h:]), jnp.asarray(dt[:, h:]), jnp.asarray(A),
        jnp.asarray(Bm[:, h:]), jnp.asarray(Cm[:, h:]), chunk_size=8,
        initial_states=s1, return_final_states=True)
    np.testing.assert_allclose(
        np.asarray(full), np.concatenate([np.asarray(y1), np.asarray(y2)], 1),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fstate), np.asarray(s2), rtol=1e-5,
                               atol=1e-5)


def test_grads_flow():
    B, L, H, P, N = 1, 16, 2, 2, 2
    x = jnp.asarray(_rand(B, L, H, P, seed=30, scale=0.5))
    dt = jnp.asarray(np.abs(_rand(B, L, H, seed=31, scale=0.3)) + 0.1)
    A = jnp.asarray(-np.abs(_rand(H, seed=32, scale=0.5)) - 0.1)
    Bm = jnp.asarray(_rand(B, L, H, N, seed=33, scale=0.5))
    Cm = jnp.asarray(_rand(B, L, H, N, seed=34, scale=0.5))

    def loss(x, dt, A, Bm, Cm):
        return jnp.sum(ssd_chunk_scan(x, dt, A, Bm, Cm, chunk_size=4) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, dt, A, Bm, Cm)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).max()) > 0
