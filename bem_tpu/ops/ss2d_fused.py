"""Fully-fused SS2D core kernel (v2): projections + scan + readout in Pallas.

Replaces the round-1 pipeline (cross_scan -> XLA einsum dt/B/C projections ->
scan kernel -> cross_merge) for the cross2d mode with ONE kernel that:

- takes only the two base directional sequences xs2 (row-major, col-major,
  channel-first (B, 2, C, L)); the two reversed directions (k=2,3) are
  handled in-kernel by scanning the same blocks in reverse lane order with
  mirrored masks — no flipped copies are ever materialized (reference
  equivalent: the 4-direction Triton cross-scan + grouped conv1d projections,
  csm_triton.py:278-391 / vmamba.py:658-661),
- computes the dt/B/C projections on the MXU inside the kernel, so the
  (B, K, C, L) dts/Bs/Cs tensors (733 MB per full-res SS2D) never exist in
  HBM (reference: selective_scan_fwd_kernel_oflex.cuh fuses the same ops),
- runs the first-order recurrence as a two-level blocked scan: plain
  doubling within SUB-lane segments, segment summaries extracted/broadcast
  with tiny one-hot matmuls on the MXU, a 5-pass doubling across segments —
  ~2x fewer VPU passes than a flat log2(LBLK) doubling scan,
- writes the direction pair already merged per stream: y_f[s] + y_r[s] is
  the reference's y_k + flip(y_{k+2}) (cross_merge_fwd, csm_triton.py:56-86).

The custom VJP is a second Pallas kernel that recomputes the block-local
forward from per-block state checkpoints (fp32, (B,2,nL,C,N) — tiny) and
runs the reverse lambda recurrence, mirroring the reference's
selective_scan_bwd_kernel_oflex.cuh reverse scan.

Shapes: xs2 (B, 2, C, L); Wx (4, P, C) with P = R + 2N; Wdt (4, C, R);
bias (4, C); A (4, C, N) (already -exp(A_logs)); D (4, C).
Returns y2 (B, 2, C, L) fp32-accumulated, cast to xs2.dtype.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mm_precision(dtype):
    """Dot-precision context for tracing a kernel over inputs of ``dtype``.

    Mosaic lowers f32 MXU dots as single-pass bf16 at the DEFAULT precision
    (same knob as XLA's), which costs ~2^-9 relative per dot — measured at
    2e-3 end-to-end on the f32 SS2D path on a real v5e, and invisible to the
    CPU interpret tests. f32 inputs therefore trace their kernels under full
    f32 dot precision; bf16 inputs (the serving path) keep the fast default
    since single-pass bf16 adds nothing beyond their own quantization.
    """
    import contextlib

    if jnp.dtype(dtype) == jnp.float32:
        return jax.default_matmul_precision("float32")
    return contextlib.nullcontext()

LBLK = 1024     # lanes (sequence positions) per block, forward
BWD_LBLK = 512  # block size on the vjp path (fwd checkpoints + bwd kernel)
SUB = 32        # level-1 segment length


# ----------------------------------------------------------------------------
# In-kernel scan helpers
# ----------------------------------------------------------------------------


def _roll(x, shift, axis=1):
    """Circular roll; pltpu.roll only accepts non-negative shifts."""
    n = x.shape[axis]
    return pltpu.roll(x, shift % n, axis=axis)


def _seg_scan(a, b, reverse: bool):
    """Within-SUB-segment inclusive doubling scan along lanes (axis 1)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, a.shape[1]), 1) % SUB
    s = 1
    while s < SUB:
        if reverse:
            mask = col >= SUB - s
            a_sh = _roll(a, -s)
            b_sh = _roll(b, -s)
        else:
            mask = col < s
            a_sh = _roll(a, s)
            b_sh = _roll(b, s)
        a_sh = jnp.where(mask, 1.0, a_sh)
        b_sh = jnp.where(mask, 0.0, b_sh)
        b = a * b_sh + b
        a = a * a_sh
        s *= 2
    return a, b


def _small_scan(a, b, reverse: bool):
    """Inclusive doubling scan over all lanes of a small (C, nseg) array."""
    n = a.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    s = 1
    while s < n:
        if reverse:
            mask = col >= n - s
            a_sh = _roll(a, -s)
            b_sh = _roll(b, -s)
        else:
            mask = col < s
            a_sh = _roll(a, s)
            b_sh = _roll(b, s)
        a_sh = jnp.where(mask, 1.0, a_sh)
        b_sh = jnp.where(mask, 0.0, b_sh)
        b = a * b_sh + b
        a = a * a_sh
        s *= 2
    return a, b


def _block_scan(a, b, E, F, reverse: bool):
    """Two-level inclusive scan of the (a, b) monoid over LBLK lanes.

    E: (LBLK, nseg) one-hot extraction of segment aggregates.
    F: (nseg, LBLK) broadcast of the exclusive cross-segment prefix.
    Returns (A_pref, B_pref): within-block inclusive prefixes.
    """
    a1, b1 = _seg_scan(a, b, reverse)
    # segment aggregates via MXU
    a_seg = jnp.dot(a1, E, preferred_element_type=jnp.float32)  # (C, nseg)
    b_seg = jnp.dot(b1, E, preferred_element_type=jnp.float32)
    a_sc, b_sc = _small_scan(a_seg, b_seg, reverse)
    # exclusive prefix per lane (0 / identity for the first segment)
    pa = jnp.dot(a_sc, F, preferred_element_type=jnp.float32)  # (C, LBLK)
    pb = jnp.dot(b_sc, F, preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, a.shape[1]), 1)
    nseg = a.shape[1] // SUB
    first = col >= (nseg - 1) * SUB if reverse else col < SUB
    pa = jnp.where(first, 1.0, pa)
    return a1 * pa, a1 * pb + b1


def _scan_matrices(lblk: int):
    nseg = lblk // SUB
    i = np.arange(lblk)
    s = np.arange(nseg)
    E_f = (i[:, None] == (s[None, :] * SUB + SUB - 1)).astype(np.float32)
    E_r = (i[:, None] == (s[None, :] * SUB)).astype(np.float32)
    F_f = ((i[None, :] // SUB) == (s[:, None] + 1)).astype(np.float32)
    F_r = ((i[None, :] // SUB) == (s[:, None] - 1)).astype(np.float32)
    return jnp.asarray(E_f), jnp.asarray(E_r), jnp.asarray(F_f), jnp.asarray(F_r)


# ----------------------------------------------------------------------------
# Forward kernel
# ----------------------------------------------------------------------------


def _fwd_body(refs, R: int, N: int, with_ckpt: bool):
    if with_ckpt:
        (xf_ref, xr_ref, wx_f, wx_r, wdt_f, wdt_r, bias_f, bias_r, a_f, a_r,
         d_f, d_r, ef, er, ff, fr,
         yf_ref, yr_ref, ckf_ref, ckr_ref, hf_ref, hr_ref) = refs
    else:
        (xf_ref, xr_ref, wx_f, wx_r, wdt_f, wdt_r, bias_f, bias_r, a_f, a_r,
         d_f, d_r, ef, er, ff, fr,
         yf_ref, yr_ref, hf_ref, hr_ref) = refs

    li = pl.program_id(2)

    @pl.when(li == 0)
    def _():
        hf_ref[...] = jnp.zeros_like(hf_ref)
        hr_ref[...] = jnp.zeros_like(hr_ref)

    def one_dir(x_ref, wx, wdt, bias, A, D, h_ref, y_ref, ck_ref, E_ref, F_ref, rev):
        E, F = E_ref[...], F_ref[...]
        x = x_ref[0, 0].astype(jnp.float32)  # (C, LBLK)
        xdbl = jnp.dot(wx[0], x, preferred_element_type=jnp.float32)  # (P,LBLK)
        dtr = jnp.dot(wdt[0], xdbl[:R], preferred_element_type=jnp.float32)
        dt = jax.nn.softplus(dtr + bias[0])  # (C, LBLK)
        du = dt * x
        if ck_ref is not None:
            ck_ref[0, 0, 0] = h_ref[...]  # (C, N) entering state
        y = jnp.zeros_like(x)
        for n in range(N):
            a = jnp.exp(dt * A[0, :, n : n + 1])
            b = du * xdbl[R + n : R + n + 1]
            a_pref, b_pref = _block_scan(a, b, E, F, rev)
            h = a_pref * h_ref[:, n : n + 1] + b_pref
            h_ref[:, n : n + 1] = h[:, 0:1] if rev else h[:, -1:]
            y = y + xdbl[R + N + n : R + N + n + 1] * h
        y = y + D[0] * x
        y_ref[0, 0] = y.astype(y_ref.dtype)

    one_dir(xf_ref, wx_f, wdt_f, bias_f, a_f, d_f, hf_ref, yf_ref,
            ckf_ref if with_ckpt else None, ef, ff, False)
    one_dir(xr_ref, wx_r, wdt_r, bias_r, a_r, d_r, hr_ref, yr_ref,
            ckr_ref if with_ckpt else None, er, fr, True)


def _run_fwd(xs2, Wx, Wdt, bias, A, D, with_ckpt: bool,
             lblk: Optional[int] = None):
    B, S, C, L = xs2.shape
    P = Wx.shape[1]
    N = A.shape[-1]
    R = P - 2 * N
    assert S == 2 and Wx.shape[0] == 4

    if lblk is None:
        # smaller blocks on the vjp path: the bwd kernel holds ~3x more
        # live (C, lblk) arrays in VMEM, and its block size must match the
        # forward checkpoints
        lblk = BWD_LBLK if with_ckpt else LBLK
    lblk = min(lblk, -(-L // 128) * 128)
    Lp = -(-L // lblk) * lblk
    if Lp != L:
        xs2 = jnp.pad(xs2, ((0, 0), (0, 0), (0, 0), (0, Lp - L)))
    nL = Lp // lblk
    E_f, E_r, F_f, F_r = _scan_matrices(lblk)

    bias3 = bias[..., None]
    D3 = D[..., None]

    last = nL - 1
    x_spec_f = pl.BlockSpec((1, 1, C, lblk), lambda b, s, l: (b, s, 0, l),
                            memory_space=pltpu.VMEM)
    x_spec_r = pl.BlockSpec((1, 1, C, lblk),
                            lambda b, s, l: (b, s, 0, last - l),
                            memory_space=pltpu.VMEM)

    def wspec(shape, off):
        return pl.BlockSpec((1,) + shape, lambda b, s, l, o=off: (s + o,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    const2 = lambda arr: pl.BlockSpec(arr.shape, lambda b, s, l: (0, 0),
                                      memory_space=pltpu.VMEM)

    in_specs = [
        x_spec_f, x_spec_r,
        wspec((P, C), 0), wspec((P, C), 2),
        wspec((C, R), 0), wspec((C, R), 2),
        wspec((C, 1), 0), wspec((C, 1), 2),
        wspec((C, N), 0), wspec((C, N), 2),
        wspec((C, 1), 0), wspec((C, 1), 2),
        const2(E_f), const2(E_r), const2(F_f), const2(F_r),
    ]
    out_specs = [x_spec_f, x_spec_r]
    out_shape = [
        jax.ShapeDtypeStruct((B, S, C, Lp), xs2.dtype),
        jax.ShapeDtypeStruct((B, S, C, Lp), xs2.dtype),
    ]
    if with_ckpt:
        ck_spec_f = pl.BlockSpec((1, 1, 1, C, N),
                                 lambda b, s, l: (b, s, l, 0, 0),
                                 memory_space=pltpu.VMEM)
        ck_spec_r = pl.BlockSpec((1, 1, 1, C, N),
                                 lambda b, s, l: (b, s, last - l, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_specs += [ck_spec_f, ck_spec_r]
        out_shape += [
            jax.ShapeDtypeStruct((B, S, nL, C, N), jnp.float32),
            jax.ShapeDtypeStruct((B, S, nL, C, N), jnp.float32),
        ]

    kernel = functools.partial(
        lambda *refs, R, N, with_ckpt: _fwd_body(refs, R, N, with_ckpt),
        R=R, N=N, with_ckpt=with_ckpt,
    )
    with mm_precision(xs2.dtype):
        outs = pl.pallas_call(
            kernel,
            grid=(B, S, nL),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((C, N), jnp.float32),
                            pltpu.VMEM((C, N), jnp.float32)],
            interpret=jax.default_backend() != "tpu",
        )(xs2, xs2, Wx, Wx, Wdt, Wdt, bias3, bias3, A, A, D3, D3,
          E_f, E_r, F_f, F_r)

    if with_ckpt:
        y_f, y_r, ck_f, ck_r = outs
    else:
        y_f, y_r = outs
        ck_f = ck_r = None
    y2 = (y_f.astype(jnp.float32) + y_r.astype(jnp.float32))[..., :L]
    if with_ckpt:
        return y2.astype(xs2.dtype), (ck_f, ck_r)
    return y2.astype(xs2.dtype)


# ----------------------------------------------------------------------------
# Pure-jnp oracle (tests + non-TPU fallback)
# ----------------------------------------------------------------------------


def ss2d_dir_ref(xs2, Wx, Wdt, bias, A, D):
    """jnp composition oracle. Same signature/semantics as ss2d_dir_fused."""
    B, S, C, L = xs2.shape
    P = Wx.shape[1]
    N = A.shape[-1]
    R = P - 2 * N
    y2 = jnp.zeros((B, S, C, L), jnp.float32)
    from .scan import linear_scan

    for s in range(S):
        x = xs2[:, s].astype(jnp.float32)  # (B, C, L)
        for rev in (False, True):
            k = s + (2 if rev else 0)
            # native reverse scan on the unflipped arrays (projections are
            # per-position); auto backend (pallas on TPU) — flip round-trips
            # and xla associative_scan dominated the train step before
            # (PLAN.md r4 s2)
            xdbl = jnp.einsum("pc,bcl->bpl", Wx[k].astype(jnp.float32), x)
            dt = jax.nn.softplus(
                jnp.einsum("cr,brl->bcl", Wdt[k].astype(jnp.float32), xdbl[:, :R])
                + bias[k].astype(jnp.float32)[None, :, None]
            )
            a = jnp.exp(dt[..., None] * A[k].astype(jnp.float32)[None, :, None, :])
            b = (dt * x)[..., None] * jnp.moveaxis(
                xdbl[:, R : R + N], 1, 2
            )[:, None, :, :]  # (B, C, L, N)
            a2 = jnp.moveaxis(a, 2, 1).reshape(B, L, C * N)
            b2 = jnp.moveaxis(b, 2, 1).reshape(B, L, C * N)
            h = linear_scan(a2, b2, reverse=rev).reshape(B, L, C, N)
            Cs = jnp.moveaxis(xdbl[:, R + N :], 1, 2)  # (B, L, N)
            y = jnp.einsum("blcn,bln->bcl", h, Cs)
            y = y + D[k].astype(jnp.float32)[None, :, None] * x
            y2 = y2.at[:, s].add(y)
    return y2.astype(xs2.dtype)


# ----------------------------------------------------------------------------
# custom VJP: backward recomputes block-local state from checkpoints
# ----------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def ss2d_dir_fused(xs2, Wx, Wdt, bias, A, D):
    """Fused SS2D directional core. Returns y2 (B, 2, C, L).

    y2[:, 0] = y_row + flip(y_row_rev); y2[:, 1] = y_col + flip(y_col_rev),
    both channel-first over the flattened L — merge to (B, C, H, W) with
    ``y2[:, 0].reshape(...) + transpose(y2[:, 1].reshape(B, C, W, H))``.
    """
    return _run_fwd(xs2, Wx, Wdt, bias, A, D, with_ckpt=False)


def _vjp_fwd(xs2, Wx, Wdt, bias, A, D):
    y2, (ck_f, ck_r) = _run_fwd(xs2, Wx, Wdt, bias, A, D, with_ckpt=True)
    return y2, (xs2, Wx, Wdt, bias, A, D, ck_f, ck_r)


def _vjp_bwd(res, g):
    xs2, Wx, Wdt, bias, A, D, ck_f, ck_r = res
    from .ss2d_fused_bwd import run_bwd

    return run_bwd(xs2, Wx, Wdt, bias, A, D, ck_f, ck_r, g)


ss2d_dir_fused.defvjp(_vjp_fwd, _vjp_bwd)
