"""Chunked state-space-duality (mamba2 SSD) scan.

TPU-native implementation of the reference's mamba2 kernel suite
(basicsr/vmamba/models/mamba2/ssd_minimal.py:34-124 is the mathematical
spec; the Triton files ssd_chunk_scan.py / ssd_chunk_state.py /
ssd_state_passing.py / ssd_combined.py implement the same algorithm).

Design notes (why this shape of code is the TPU way):

- The SSD reformulation is exactly the "attention-like" matmul form of the
  selective scan: the intra-chunk term is a (l, l) lower-triangular masked
  matmul and the chunk-state/state-output terms are batched matmuls — all
  of it lands on the MXU as einsums; XLA fuses the exp/mask elementwise ops
  into them.
- The inter-chunk recurrence (reference ssd_state_passing.py) is a
  first-order linear recurrence over per-chunk states; here it is a
  ``jax.lax.associative_scan`` over (decay, state) pairs instead of the
  reference's sequential state-passing kernel — O(log n_chunks) depth.
- fp32 accumulation for the recurrence regardless of input dtype (the
  reference kernels also carry fp32 states).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp


def segsum(x: jax.Array) -> jax.Array:
    """Stable segment sum: out[..., i, j] = sum_{k=j+1..i} x[..., k] for
    j < i, 0 on the diagonal, -inf above (ssd_minimal.py:22-31)."""
    T = x.shape[-1]
    xe = jnp.repeat(x[..., None], T, axis=-1)  # (..., d, e=T): xe[d, e] = x_d
    mask_strict = jnp.tril(jnp.ones((T, T), bool), k=-1)  # e < d
    xe = jnp.where(mask_strict, xe, 0.0)
    out = jnp.cumsum(xe, axis=-2)  # out[i, j] = sum_{d=j+1..i} x_d
    mask_incl = jnp.tril(jnp.ones((T, T), bool), k=0)
    return jnp.where(mask_incl, out, -jnp.inf)


def ssd_chunked(
    u: jax.Array,           # (B, L, H, P) already dt-scaled inputs
    w: jax.Array,           # (B, L, H)    log-decay  A*dt
    Bm: jax.Array,          # (B, L, H, N)
    Cm: jax.Array,          # (B, L, H, N)
    chunk: int,
    initial_states: Optional[jax.Array] = None,  # (B, H, P, N)
) -> Tuple[jax.Array, jax.Array]:
    """Core chunked SSD recurrence (ssd_minimal_discrete, spec lines 34-81).

    Returns (Y (B, L, H, P) fp32, final_state (B, H, P, N) fp32).
    """
    Bsz, L, H, P = u.shape
    N = Bm.shape[-1]
    assert L % chunk == 0
    c = L // chunk

    f32 = jnp.float32
    u = u.astype(f32)
    w = w.astype(f32)
    Bm = Bm.astype(f32)
    Cm = Cm.astype(f32)

    # block layout: (B, c, l, H, ...)
    ub = u.reshape(Bsz, c, chunk, H, P)
    Bb = Bm.reshape(Bsz, c, chunk, H, N)
    Cb = Cm.reshape(Bsz, c, chunk, H, N)
    wb = jnp.transpose(w.reshape(Bsz, c, chunk, H), (0, 3, 1, 2))  # (B, H, c, l)
    w_cs = jnp.cumsum(wb, axis=-1)  # (B, H, c, l)

    # 1. intra-chunk (diagonal blocks): lower-triangular masked matmul
    Lmat = jnp.exp(segsum(wb))  # (B, H, c, l, l)
    Y_diag = jnp.einsum(
        "bclhn,bcshn,bhcls,bcshp->bclhp", Cb, Bb, Lmat, ub,
        preferred_element_type=f32,
    )

    # 2. per-chunk end states
    decay_states = jnp.exp(w_cs[..., -1:] - w_cs)  # (B, H, c, l)
    states = jnp.einsum(
        "bclhn,bhcl,bclhp->bchpn", Bb, decay_states, ub,
        preferred_element_type=f32,
    )  # (B, c, H, P, N)

    # 3. inter-chunk recurrence: state_z = exp(sum_w_z) * state_{z-1} + states_z
    #    as an associative scan over chunks (ssd_state_passing.py equivalent)
    chunk_decay = jnp.exp(w_cs[..., -1])  # (B, H, c)
    if initial_states is not None:
        init = initial_states.astype(f32)[:, None]  # (B, 1, H, P, N)
        states = jnp.concatenate([init, states], axis=1)
        one = jnp.ones_like(chunk_decay[..., :1])
        chunk_decay = jnp.concatenate([one, chunk_decay], axis=-1)
        c_eff = c + 1
    else:
        c_eff = c
    a = jnp.transpose(chunk_decay, (0, 2, 1))[..., None, None]  # (B, c, H, 1, 1)

    def combine(lhs, rhs):
        a1, s1 = lhs
        a2, s2 = rhs
        return a1 * a2, s2 + a2 * s1

    a_sc, states_inc = jax.lax.associative_scan(combine, (a, states), axis=1)
    # states entering chunk z = inclusive scan up to z-1 (zeros before chunk 0)
    zeros = jnp.zeros_like(states_inc[:, :1])
    states_in = jnp.concatenate([zeros, states_inc[:, :-1]], axis=1)
    if initial_states is not None:
        states_in = states_in[:, 1:]  # drop the synthetic leading chunk
        states_inc = states_inc[:, 1:]
    final_state = states_inc[:, -1]  # (B, H, P, N)

    # 4. state -> output for each position
    state_decay_out = jnp.exp(w_cs)  # (B, H, c, l)
    Y_off = jnp.einsum(
        "bclhn,bchpn,bhcl->bclhp", Cb, states_in, state_decay_out,
        preferred_element_type=f32,
    )

    Y = (Y_diag + Y_off).reshape(Bsz, L, H, P)
    return Y, final_state


def ssd_chunk_scan(
    x: jax.Array,           # (B, L, H, P)
    dt: jax.Array,          # (B, L, H)
    A: jax.Array,           # (H,)
    Bm: jax.Array,          # (B, L, G, N)
    Cm: jax.Array,          # (B, L, G, N)
    chunk_size: int,
    D: Optional[jax.Array] = None,        # (H,) or (H, P)
    z: Optional[jax.Array] = None,        # (B, L, H, P)
    dt_bias: Optional[jax.Array] = None,  # (H,)
    initial_states: Optional[jax.Array] = None,
    dt_softplus: bool = False,
    return_final_states: bool = False,
) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
    """mamba_chunk_scan_combined (ssd_minimal.py:88-124) in jnp.

    Output dtype follows x; internals accumulate fp32.
    """
    Bsz, L, H, P = x.shape
    G, N = Bm.shape[2], Bm.shape[3]

    while L % chunk_size != 0:
        chunk_size >>= 1

    if H != G:
        assert H % G == 0
        rep = H // G
        Bm = jnp.repeat(Bm, rep, axis=2)
        Cm = jnp.repeat(Cm, rep, axis=2)

    dt = dt.astype(jnp.float32)
    if dt_bias is not None:
        dt = dt + dt_bias.astype(jnp.float32)
    if dt_softplus:
        dt = jax.nn.softplus(dt)
    u = x.astype(jnp.float32) * dt[..., None]
    w = A.astype(jnp.float32) * dt  # (B, L, H)

    y, final_state = ssd_chunked(u, w, Bm, Cm, chunk_size, initial_states)
    if D is not None:
        Df = D.astype(jnp.float32)
        if Df.ndim == 1:
            Df = Df[:, None]
        y = y + Df * x.astype(jnp.float32)
    if z is not None:
        zf = z.astype(jnp.float32)
        y = y * (zf * jax.nn.sigmoid(zf))
    y = y.astype(x.dtype)
    return (y, final_state) if return_final_states else y


def selective_state_update(
    state: jax.Array,
    x: jax.Array,
    dt: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: Optional[jax.Array] = None,
    z: Optional[jax.Array] = None,
    dt_bias: Optional[jax.Array] = None,
    dt_softplus: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Single-token incremental decode step of the selective scan.

    Functional counterpart of the reference's in-place Triton kernel
    (mamba2/selective_state_update.py:119-201; torch spec :202-264):
    one recurrence step ``h' = exp(dt*A) * h + dt * B * x`` followed by the
    readout ``y = C . h' (+ D*x) (* silu(z))``. Because JAX arrays are
    immutable the updated state is RETURNED instead of mutated:
    ``new_state, out = selective_state_update(state, ...)``.

    Shapes follow the reference: ``state (b, d, n)`` or ``(b, h, d, n)``;
    ``x/dt (b, [h,] d)``; ``A (d, n)`` or ``(h, d, n)``; ``B/C (b, n)`` or
    ``(b, g, n)`` with heads grouped g|h; optional ``D/dt_bias (d,)`` or
    ``(h, d)``; optional gate ``z`` like ``x``. This is a tiny
    elementwise + (d, n) contraction per step — XLA fuses it into one
    kernel; no Pallas needed.
    """
    has_heads = state.ndim > 3
    if state.ndim == 3:
        state = state[:, None]
    if x.ndim == 2:
        x = x[:, None]
    if dt.ndim == 2:
        dt = dt[:, None]
    if A.ndim == 2:
        A = A[None]
    if B.ndim == 2:
        B = B[:, None]
    if C.ndim == 2:
        C = C[:, None]
    if D is not None and D.ndim == 1:
        D = D[None]
    if z is not None and z.ndim == 2:
        z = z[:, None]
    if dt_bias is not None and dt_bias.ndim == 1:
        dt_bias = dt_bias[None]
    batch, nheads, dim, dstate = state.shape
    if x.shape != (batch, nheads, dim) or dt.shape != x.shape:
        raise ValueError(f"x/dt shape {x.shape}/{dt.shape} vs state {state.shape}")
    if A.shape != (nheads, dim, dstate):
        raise ValueError(f"A shape {A.shape}")
    ngroups = B.shape[1]
    if nheads % ngroups:
        raise ValueError("nheads must be divisible by ngroups")
    rep = nheads // ngroups

    dtf = dt.astype(jnp.float32)
    if dt_bias is not None:
        dtf = dtf + dt_bias.astype(jnp.float32)[None]
    if dt_softplus:
        dtf = jax.nn.softplus(dtf)
    dA = jnp.exp(dtf[..., None] * A.astype(jnp.float32)[None])  # (b,h,d,n)
    Bh = jnp.repeat(B, rep, axis=1).astype(jnp.float32)         # (b,h,n)
    Ch = jnp.repeat(C, rep, axis=1).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    dB = dtf[..., None] * Bh[:, :, None, :]                     # (b,h,d,n)
    new_state = state.astype(jnp.float32) * dA + dB * xf[..., None]
    out = jnp.einsum("bhdn,bhn->bhd", new_state, Ch)
    if D is not None:
        out = out + xf * D.astype(jnp.float32)[None]
    if z is not None:
        zf = z.astype(jnp.float32)
        out = out * (zf * jax.nn.sigmoid(zf))
    out = out.astype(x.dtype)
    new_state = new_state.astype(state.dtype)
    if not has_heads:
        out = out[:, 0]
        new_state = new_state[:, 0]
    return new_state, out


def layernorm_gated(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    z: Optional[jax.Array] = None,
    eps: float = 1e-6,
    group_size: Optional[int] = None,
    norm_before_gate: bool = True,
    is_rms_norm: bool = False,
) -> jax.Array:
    """Gated (group) Layer/RMS norm over the last axis.

    Semantics of the reference's fused Triton layernorm
    (mamba2/layernorm_gated.py:338-385; python spec rms_norm_ref :18-40):
    ``norm(x) * silu(z)`` when ``norm_before_gate`` else ``norm(x*silu(z))``,
    with fp32 statistics, optional ``group_size``-grouped moments, and the
    affine applied over the FULL channel axis. One fused XLA elementwise
    chain on TPU — the reference's kernel fusion falls out of jit for free.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    w = weight.astype(jnp.float32)
    b = bias.astype(jnp.float32) if bias is not None else None
    zf = z.astype(jnp.float32) if z is not None else None
    if zf is not None and not norm_before_gate:
        xf = xf * (zf * jax.nn.sigmoid(zf))

    def _norm(v):
        if not is_rms_norm:
            v = v - v.mean(axis=-1, keepdims=True)
        return v * jax.lax.rsqrt(
            jnp.square(v).mean(axis=-1, keepdims=True) + eps)

    if group_size is None:
        out = _norm(xf) * w
    else:
        if x.shape[-1] % group_size:
            raise ValueError("group_size must divide the channel axis")
        g = xf.reshape(xf.shape[:-1] + (-1, group_size))
        out = _norm(g).reshape(xf.shape) * w
    if b is not None:
        out = out + b
    if zf is not None and norm_before_gate:
        out = out * (zf * jax.nn.sigmoid(zf))
    return out.astype(dtype)
