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


# ---- mamba2 aux ops: selective_state_update + layernorm_gated --------------

REF_SSU = "/root/reference/basicsr/vmamba/models/mamba2/selective_state_update.py"
REF_LNG = "/root/reference/basicsr/vmamba/models/mamba2/layernorm_gated.py"


@pytest.fixture(scope="module")
def ref_aux():
    """Reference torch specs (selective_state_update_ref / rms_norm_ref)
    exec'd with a triton stub rich enough for their kernel decorators."""
    import sys
    import types

    saved = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k == "triton" or k.startswith("triton.")}
    triton = types.ModuleType("triton")
    triton.jit = lambda f=None, **kw: (f if f is not None else (lambda g: g))
    triton.heuristics = lambda *a, **k: (lambda f: f)
    triton.autotune = lambda *a, **k: (lambda f: f)
    triton.next_power_of_2 = lambda n: 1 << max(int(n) - 1, 0).bit_length()
    triton.cdiv = lambda a, b: -(-a // b)
    triton.Config = lambda *a, **k: types.SimpleNamespace(kwargs=k)
    tl = types.ModuleType("triton.language")
    tl.constexpr = object
    tl.dtype = type("dtype", (), {})
    triton.language = tl
    sys.modules["triton"] = triton
    sys.modules["triton.language"] = tl
    try:
        ssu = _exec(REF_SSU, "ref_selective_state_update")
        lng = _exec(REF_LNG, "ref_layernorm_gated")
    finally:
        sys.modules.pop("triton", None)
        sys.modules.pop("triton.language", None)
        sys.modules.update(saved)
    return ssu, lng


@pytest.mark.parametrize("heads", [False, True])
@pytest.mark.parametrize("with_extras", [False, True])
def test_selective_state_update_parity(ref_aux, heads, with_extras):
    from bem_tpu.ops.ssd import selective_state_update

    ssu, _ = ref_aux
    b, h, g, d, n = 2, 4, 2, 6, 8
    if heads:
        st = _rand(b, h, d, n, seed=10, scale=0.5)
        x = _rand(b, h, d, seed=11)
        dt = _rand(b, h, d, seed=12, scale=0.4)
        A = -np.abs(_rand(h, d, n, seed=13, scale=0.5))
        B = _rand(b, g, n, seed=14)
        C = _rand(b, g, n, seed=15)
        D = _rand(h, d, seed=16) if with_extras else None
        z = _rand(b, h, d, seed=17) if with_extras else None
        dtb = _rand(h, d, seed=18, scale=0.2) if with_extras else None
    else:
        st = _rand(b, d, n, seed=20, scale=0.5)
        x = _rand(b, d, seed=21)
        dt = _rand(b, d, seed=22, scale=0.4)
        A = -np.abs(_rand(d, n, seed=23, scale=0.5))
        B = _rand(b, n, seed=24)
        C = _rand(b, n, seed=25)
        D = _rand(d, seed=26) if with_extras else None
        z = _rand(b, d, seed=27) if with_extras else None
        dtb = _rand(d, seed=28, scale=0.2) if with_extras else None

    t = lambda a: None if a is None else torch.from_numpy(a.copy())
    st_t = t(st)
    out_t = ssu.selective_state_update_ref(
        st_t, t(x), t(dt), t(A), t(B), t(C), D=t(D), z=t(z),
        dt_bias=t(dtb), dt_softplus=True)

    j = lambda a: None if a is None else jnp.asarray(a)
    new_state, out = selective_state_update(
        j(st), j(x), j(dt), j(A), j(B), j(C), D=j(D), z=j(z),
        dt_bias=j(dtb), dt_softplus=True)

    np.testing.assert_allclose(np.asarray(out), out_t.numpy(),
                               rtol=1e-5, atol=1e-5)
    # the reference mutates `state` in place; ours returns it
    np.testing.assert_allclose(np.asarray(new_state), st_t.numpy(),
                               rtol=1e-5, atol=1e-5)
    assert new_state.shape == st.shape and out.shape == x.shape


@pytest.mark.parametrize("norm_before_gate", [True, False])
@pytest.mark.parametrize("group_size", [None, 4])
def test_rmsnorm_gated_parity(ref_aux, norm_before_gate, group_size):
    from bem_tpu.ops.ssd import layernorm_gated

    _, lng = ref_aux
    b, l, c = 2, 5, 16
    x = _rand(b, l, c, seed=30)
    w = _rand(c, seed=31, scale=0.5) + 1.0
    bb = _rand(c, seed=32, scale=0.2)
    z = _rand(b, l, c, seed=33)

    want = lng.rms_norm_ref(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(bb),
        z=torch.from_numpy(z), eps=1e-6, group_size=group_size,
        norm_before_gate=norm_before_gate).numpy()
    got = layernorm_gated(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(bb), z=jnp.asarray(z),
        eps=1e-6, group_size=group_size, norm_before_gate=norm_before_gate,
        is_rms_norm=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("norm_before_gate", [True, False])
def test_layernorm_gated_ln_mode(ref_aux, norm_before_gate):
    """is_rms_norm=False spec: norm(x)*silu(z) / norm(x*silu(z))
    (layernorm_gated.py:343 docstring) with torch F.layer_norm."""
    from bem_tpu.ops.ssd import layernorm_gated

    import torch.nn.functional as F

    b, l, c = 2, 5, 16
    x = _rand(b, l, c, seed=40)
    w = _rand(c, seed=41, scale=0.5) + 1.0
    bb = _rand(c, seed=42, scale=0.2)
    z = _rand(b, l, c, seed=43)

    xt, zt = torch.from_numpy(x), torch.from_numpy(z)
    if norm_before_gate:
        want = (F.layer_norm(xt, (c,), torch.from_numpy(w),
                             torch.from_numpy(bb), eps=1e-6)
                * F.silu(zt)).numpy()
    else:
        want = F.layer_norm(xt * F.silu(zt), (c,), torch.from_numpy(w),
                            torch.from_numpy(bb), eps=1e-6).numpy()
    got = layernorm_gated(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(bb), z=jnp.asarray(z),
        eps=1e-6, norm_before_gate=norm_before_gate, is_rms_norm=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
