"""Fused selective-scan Pallas kernel, L-minor (channel-first) layout.

The composition path (ops.scan.selective_scan) materializes ``exp(Δ·A)`` and
``Δ·B·u`` in HBM — 3 extra (L, D)-sized tensors per call. This kernel fuses
discretization + scan + readout like the reference CUDA kernel
(selective_scan_fwd_kernel_oflex.cuh: per-thread loads of u/delta/B/C and an
in-register scan), so HBM traffic drops to: read u, Δ; read B, C
(negligible at d_state N=1); write y.

Layout choice: **L rides the 128-wide lane dimension** and channels the
sublanes. XLA pads an array's minor dim to 128 in HBM, so the BEM nets'
narrow channel counts (n_feat=40) would inflate 3.2x in a channels-minor
layout; with L minor the arrays are compact and the scan's doubling shifts
run along lanes (pltpu.roll axis=-1).

Shapes: u/delta (M, C, L) with M = batch*K directions; B/C (M, N, L);
A (M, C, N); D/delta_bias (M, C, 1). Grid (M, C-blocks, L-blocks); the L
axis is innermost-sequential and carries the running state h (one lane
column per state) in VMEM scratch — the chunked-prefix formulation of
kernels/selective_scan/README.md:22-46.

Backward: custom_vjp recomputes through the jnp composition (training runs
at 128^2 patches where the composition is cheap; full-resolution inference
is forward-only and gets the fused path).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LBLK = 4096  # lanes per block (sequence positions)
_CBLK = 64  # sublanes per block (channels)


def _shifted_lanes(x, s, fill):
    rolled = pltpu.roll(x, s, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col < s, jnp.full_like(x, fill), rolled)


def _scan_block_lanes(a, b):
    """Inclusive (a, b)-monoid scan along the lane axis (axis 1)."""
    n = a.shape[1]
    s = 1
    while s < n:
        a_sh = _shifted_lanes(a, s, 1.0)
        b_sh = _shifted_lanes(b, s, 0.0)
        b = a * b_sh + b
        a = a * a_sh
        s *= 2
    return a, b


def _make_kernel(N: int, softplus: bool, has_D: bool, has_bias: bool):
    def kernel(u_ref, dt_ref, A_ref, B_ref, C_ref, D_ref, bias_ref, y_ref, h_ref):
        li = pl.program_id(2)

        @pl.when(li == 0)
        def _():
            h_ref[...] = jnp.zeros_like(h_ref)

        u = u_ref[0].astype(jnp.float32)  # (CBLK, LBLK)
        dt = dt_ref[0].astype(jnp.float32)
        if has_bias:
            dt = dt + bias_ref[0].astype(jnp.float32)  # (CBLK, 1) broadcasts
        if softplus:
            dt = jax.nn.softplus(dt)
        du = dt * u

        y = jnp.zeros_like(u)
        for n in range(N):
            A_n = A_ref[0, :, n : n + 1].astype(jnp.float32)  # (CBLK, 1)
            B_n = B_ref[0, n : n + 1, :].astype(jnp.float32)  # (1, LBLK)
            C_n = C_ref[0, n : n + 1, :].astype(jnp.float32)
            a = jnp.exp(dt * A_n)
            b = du * B_n
            a_pref, b_pref = _scan_block_lanes(a, b)
            h = a_pref * h_ref[:, n : n + 1] + b_pref
            h_ref[:, n : n + 1] = h[:, -1:]
            y = y + C_n * h
        if has_D:
            y = y + D_ref[0].astype(jnp.float32) * u
        y_ref[0] = y.astype(y_ref.dtype)

    return kernel


def _fused_fwd(u, delta, A, B, C, D, delta_bias, delta_softplus):
    """u/delta: (M, C, L); A: (M, C, N); B/C: (M, N, L); D/bias: (M, C, 1)."""
    M, Cdim, L = u.shape
    N = A.shape[-1]

    has_D = D is not None
    has_bias = delta_bias is not None
    if not has_D:
        D = jnp.zeros((M, Cdim, 1), jnp.float32)
    if not has_bias:
        delta_bias = jnp.zeros((M, Cdim, 1), jnp.float32)

    cblk = min(_CBLK, Cdim)
    grid = (M, pl.cdiv(Cdim, cblk), pl.cdiv(L, _LBLK))
    ld_spec = pl.BlockSpec((1, cblk, _LBLK), lambda m, c, l: (m, c, l),
                           memory_space=pltpu.VMEM)
    bc_spec = pl.BlockSpec((1, N, _LBLK), lambda m, c, l: (m, 0, l),
                           memory_space=pltpu.VMEM)
    a_spec = pl.BlockSpec((1, cblk, N), lambda m, c, l: (m, c, 0),
                          memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((1, cblk, 1), lambda m, c, l: (m, c, 0),
                          memory_space=pltpu.VMEM)

    # output in the input dtype (bf16 in, bf16 out) — the fp32 carry lives in
    # scratch; the reference's "oflex" fp32 output is only needed for parity
    # tests, which run the composition path
    y = pl.pallas_call(
        _make_kernel(N, delta_softplus, has_D, has_bias),
        grid=grid,
        in_specs=[ld_spec, ld_spec, a_spec, bc_spec, bc_spec, d_spec, d_spec],
        out_specs=ld_spec,
        out_shape=jax.ShapeDtypeStruct((M, Cdim, L), u.dtype),
        scratch_shapes=[pltpu.VMEM((cblk, max(N, 1)), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(u, delta, A, B, C, D, delta_bias)
    return y


def _reference_unfolded(u, delta, A, B, C, D, delta_bias, delta_softplus):
    """jnp composition on the (M, C, L) layout — backward-pass oracle."""
    from .scan import linear_scan

    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    # (M, C, L, N)
    a = jnp.exp(delta[..., None] * A.astype(jnp.float32)[:, :, None, :])
    b = (delta * u)[..., None] * jnp.swapaxes(B.astype(jnp.float32), 1, 2)[:, None]
    M, Cdim, L, N = a.shape
    a2 = jnp.moveaxis(a, 2, 1).reshape(M, L, Cdim * N)
    b2 = jnp.moveaxis(b, 2, 1).reshape(M, L, Cdim * N)
    # auto backend (pallas on TPU) — see PLAN.md r4 s2 train-trace buckets
    h = linear_scan(a2, b2).reshape(M, L, Cdim, N)
    Cs = jnp.swapaxes(C.astype(jnp.float32), 1, 2)  # (M, L, N)
    y = jnp.sum(h * Cs[:, :, None, :], axis=-1)  # (M, L, C)
    y = jnp.swapaxes(y, 1, 2)
    if D is not None:
        y = y + u * D.astype(jnp.float32)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _fused(u, delta, A, B, C, D, delta_bias, delta_softplus):
    return _fused_fwd(u, delta, A, B, C, D, delta_bias, delta_softplus)


def _fused_vjp_fwd(u, delta, A, B, C, D, delta_bias, delta_softplus):
    y = _fused_fwd(u, delta, A, B, C, D, delta_bias, delta_softplus)
    return y, (u, delta, A, B, C, D, delta_bias)


def _fused_vjp_bwd(delta_softplus, res, g):
    u, delta, A, B, C, D, delta_bias = res
    f = lambda u_, d_, A_, B_, C_, D_, b_: _reference_unfolded(
        u_, d_, A_, B_, C_, D_, b_, delta_softplus)
    _, vjp = jax.vjp(f, u, delta, A, B, C, D, delta_bias)
    return vjp(g)


_fused.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def selective_scan_fused(
    u: jax.Array,        # (Bt, K, C, L) channel-first
    delta: jax.Array,    # (Bt, K, C, L)
    A: jax.Array,        # (K*C, N)
    B: jax.Array,        # (Bt, K, N, L)
    C: jax.Array,        # (Bt, K, N, L)
    D: Optional[jax.Array] = None,           # (K*C,)
    delta_bias: Optional[jax.Array] = None,  # (K*C,)
    delta_softplus: bool = True,
) -> jax.Array:
    """Fused selective scan, channel-first. Returns y: (Bt, K, C, L) fp32."""
    Bt, K, Cdim, L = u.shape
    N = A.shape[-1]
    M = Bt * K

    u2 = u.reshape(M, Cdim, L)
    d2 = delta.reshape(M, Cdim, L)
    B2 = B.reshape(M, N, L)
    C2 = C.reshape(M, N, L)
    A2 = jnp.broadcast_to(
        A.reshape(1, K, Cdim, N), (Bt, K, Cdim, N)
    ).reshape(M, Cdim, N)
    D2 = None
    b2 = None
    if D is not None:
        D2 = jnp.broadcast_to(
            D.reshape(1, K, Cdim, 1), (Bt, K, Cdim, 1)
        ).reshape(M, Cdim, 1)
    if delta_bias is not None:
        b2 = jnp.broadcast_to(
            delta_bias.reshape(1, K, Cdim, 1), (Bt, K, Cdim, 1)
        ).reshape(M, Cdim, 1)

    y = _fused(u2, d2, A2, B2, C2, D2, b2, delta_softplus)
    return y.reshape(Bt, K, Cdim, L)
