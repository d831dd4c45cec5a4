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
