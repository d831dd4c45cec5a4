"""Backward Pallas kernel for the fused SS2D directional core.

Mirrors the reference's reverse-scan backward kernel
(selective_scan_bwd_kernel_oflex.cuh): per block it *recomputes* the
forward discretization and the block-local states h from the fp32 entering
state checkpointed by the forward pass, runs the lambda recurrence

    lambda_t = g_t * C_t + a_{t+1} * lambda_{t+1}

as a reverse blockwise scan (for the k=2,3 reversed directions the lambda
recurrence runs in natural lane order), and produces the input gradient plus
per-(batch, stream, direction) weight-gradient partials accumulated across
the sequence grid in resident output blocks.

Math (per direction, N states; see ss2d_fused.py for the forward):
    dD   = sum_l g*x                 db   = lambda
    da   = lambda * h_prev           ddt  = sum_n da*a*A_n + db*x*B_n
    dA_n = sum_l da*a*dt             dB_n = sum_c db*dt*x
    dC_n = sum_c g*h                 ddtr = ddt * sigmoid(dtr + bias)
    dWdt = ddtr @ xdbl[:R]^T         dxdbl = [Wdt^T@ddtr; dB; dC]
    dWx  = dxdbl @ x^T               dx   = Wx^T@dxdbl + D*g + sum_n db*dt*B_n
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ss2d_fused import BWD_LBLK, _block_scan, _roll, _scan_matrices


def _bwd_body(refs, R: int, N: int, lblk: int):
    (xf_ref, xr_ref, gf_ref, gr_ref, ckf_ref, ckr_ref,
     wx_f, wx_r, wdt_f, wdt_r, bias_f, bias_r, a_f, a_r, d_f, d_r,
     ef, er, ff, fr,
     dxf_ref, dxr_ref,
     dwx_f_ref, dwx_r_ref, dwdt_f_ref, dwdt_r_ref,
     dbias_f_ref, dbias_r_ref, dA_f_ref, dA_r_ref, dD_f_ref, dD_r_ref,
     lam_f, lam_r, ab_f, ab_r) = refs

    li = pl.program_id(2)
    first = li == 0

    @pl.when(first)
    def _():
        lam_f[...] = jnp.zeros_like(lam_f)
        lam_r[...] = jnp.zeros_like(lam_r)
        ab_f[...] = jnp.ones_like(ab_f)
        ab_r[...] = jnp.ones_like(ab_r)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, lblk), 1)
    Ef, Er, Ff, Fr = ef[...], er[...], ff[...], fr[...]

    def one_dir(x_ref, g_ref, ck_ref, wx, wdt, bias, A, D,
                lam_ref, ab_ref, dx_ref,
                dwx_ref, dwdt_ref, dbias_ref, dA_ref, dD_ref, rev):
        E, F = (Er, Fr) if rev else (Ef, Ff)
        x = x_ref[0, 0].astype(jnp.float32)  # (C, lblk)
        g = g_ref[0, 0].astype(jnp.float32)
        ck = ck_ref[0, 0, 0]  # (C, N)

        # ---- recompute forward block-locals --------------------------------
        xdbl = jnp.dot(wx[0], x, preferred_element_type=jnp.float32)
        dtr = jnp.dot(wdt[0], xdbl[:R], preferred_element_type=jnp.float32)
        dtrb = dtr + bias[0]
        dt = jax.nn.softplus(dtrb)
        du = dt * x

        ddt = jnp.zeros_like(dt)
        dx = D[0] * g
        dB_rows = []
        dC_rows = []
        dA_cols = []
        for n in range(N):
            A_n = A[0, :, n : n + 1]
            B_n = xdbl[R + n : R + n + 1]
            C_n = xdbl[R + N + n : R + N + n + 1]
            a = jnp.exp(dt * A_n)
            b = du * B_n
            a_pref, b_pref = _block_scan(a, b, E, F, rev)
            h = a_pref * ck[:, n : n + 1] + b_pref
            # previous-in-scan-order state
            if rev:
                h_prev = jnp.where(col == lblk - 1, ck[:, n : n + 1],
                                   _roll(h, -1))
            else:
                h_prev = jnp.where(col == 0, ck[:, n : n + 1],
                                   _roll(h, 1))
            # lambda recurrence coefficient: a at the next-in-lambda-order
            # position; block boundary value carried in ab_ref
            if rev:
                c = jnp.where(col == 0, ab_ref[:, n : n + 1],
                              _roll(a, 1))
                ab_new = a[:, lblk - 1 :]
            else:
                c = jnp.where(col == lblk - 1, ab_ref[:, n : n + 1],
                              _roll(a, -1))
                ab_new = a[:, 0:1]
            gc = g * C_n
            # lambda runs opposite to the scan direction: a forward scan for
            # the reversed directions (forward matrices), reverse otherwise
            lA, lB = _block_scan(c, gc, Ef if rev else Er,
                                 Ff if rev else Fr, not rev)
            lam = lA * lam_ref[:, n : n + 1] + lB
            lam_ref[:, n : n + 1] = lam[:, -1:] if rev else lam[:, 0:1]
            ab_ref[:, n : n + 1] = ab_new

            da = lam * h_prev
            ddt = ddt + da * a * A_n + lam * x * B_n
            dx = dx + lam * dt * B_n
            dB_rows.append(jnp.sum(lam * du, axis=0, keepdims=True))
            dC_rows.append(jnp.sum(g * h, axis=0, keepdims=True))
            dA_cols.append(jnp.sum(da * a * dt, axis=1, keepdims=True))

        ddtr = ddt * jax.nn.sigmoid(dtrb)
        dxdbl = jnp.concatenate(
            [jnp.dot(wdt[0].T, ddtr, preferred_element_type=jnp.float32)]
            + dB_rows + dC_rows,
            axis=0,
        )  # (P, lblk)
        dx = dx + jnp.dot(wx[0].T, dxdbl, preferred_element_type=jnp.float32)
        dx_ref[0, 0] = dx.astype(dx_ref.dtype)

        dwx = jnp.dot(dxdbl, x.T, preferred_element_type=jnp.float32)
        dwdt = jnp.dot(ddtr, xdbl[:R].T, preferred_element_type=jnp.float32)
        dbias = jnp.sum(ddtr, axis=1, keepdims=True)
        dA_blk = jnp.concatenate(dA_cols, axis=1)  # (C, N)
        dD_blk = jnp.sum(g * x, axis=1, keepdims=True)

        @pl.when(first)
        def _():
            dwx_ref[0] = dwx
            dwdt_ref[0] = dwdt
            dbias_ref[0] = dbias
            dA_ref[0] = dA_blk
            dD_ref[0] = dD_blk

        @pl.when(jnp.logical_not(first))
        def _():
            dwx_ref[0] += dwx
            dwdt_ref[0] += dwdt
            dbias_ref[0] += dbias
            dA_ref[0] += dA_blk
            dD_ref[0] += dD_blk

    one_dir(xf_ref, gf_ref, ckf_ref, wx_f, wdt_f, bias_f, a_f, d_f,
            lam_f, ab_f, dxf_ref, dwx_f_ref, dwdt_f_ref, dbias_f_ref,
            dA_f_ref, dD_f_ref, False)
    one_dir(xr_ref, gr_ref, ckr_ref, wx_r, wdt_r, bias_r, a_r, d_r,
            lam_r, ab_r, dxr_ref, dwx_r_ref, dwdt_r_ref, dbias_r_ref,
            dA_r_ref, dD_r_ref, True)


def run_bwd(xs2, Wx, Wdt, bias, A, D, ck_f, ck_r, g):
    """VJP: returns (dxs2, dWx, dWdt, dbias, dA, dD)."""
    B, S, C, L = xs2.shape
    P = Wx.shape[1]
    N = A.shape[-1]
    R = P - 2 * N
    nL = ck_f.shape[2]
    lblk = min(BWD_LBLK, -(-L // 128) * 128)
    Lp = nL * lblk
    if Lp != L:
        pad = ((0, 0), (0, 0), (0, 0), (0, Lp - L))
        xs2 = jnp.pad(xs2, pad)
        g = jnp.pad(g, pad)

    E_f, E_r, F_f, F_r = _scan_matrices(lblk)
    bias3 = bias[..., None]
    D3 = D[..., None]

    # forward-direction blocks run time-DESCENDING (lambda flows backward),
    # reversed-direction blocks time-ASCENDING
    last = nL - 1
    spec_desc = pl.BlockSpec((1, 1, C, lblk), lambda b, s, l: (b, s, 0, last - l),
                             memory_space=pltpu.VMEM)
    spec_asc = pl.BlockSpec((1, 1, C, lblk), lambda b, s, l: (b, s, 0, l),
                            memory_space=pltpu.VMEM)
    ck_desc = pl.BlockSpec((1, 1, 1, C, N),
                           lambda b, s, l: (b, s, last - l, 0, 0),
                           memory_space=pltpu.VMEM)
    ck_asc = pl.BlockSpec((1, 1, 1, C, N), lambda b, s, l: (b, s, l, 0, 0),
                          memory_space=pltpu.VMEM)

    def wspec(shape, off):
        return pl.BlockSpec((1,) + shape,
                            lambda b, s, l, o=off: (s + o,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    const2 = lambda arr: pl.BlockSpec(arr.shape, lambda b, s, l: (0, 0),
                                      memory_space=pltpu.VMEM)

    def accspec(shape, off):
        # per-(b, stream) accumulator, resident across the l grid axis
        return pl.BlockSpec((1,) + shape,
                            lambda b, s, l: (b * 2 + s,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [
        spec_desc, spec_asc,        # x
        spec_desc, spec_asc,        # g
        ck_desc, ck_asc,            # checkpoints
        wspec((P, C), 0), wspec((P, C), 2),
        wspec((C, R), 0), wspec((C, R), 2),
        wspec((C, 1), 0), wspec((C, 1), 2),
        wspec((C, N), 0), wspec((C, N), 2),
        wspec((C, 1), 0), wspec((C, 1), 2),
        const2(E_f), const2(E_r), const2(F_f), const2(F_r),
    ]
    BS = B * S
    out_specs = [
        spec_desc, spec_asc,
        accspec((P, C), 0), accspec((P, C), 2),
        accspec((C, R), 0), accspec((C, R), 2),
        accspec((C, 1), 0), accspec((C, 1), 2),
        accspec((C, N), 0), accspec((C, N), 2),
        accspec((C, 1), 0), accspec((C, 1), 2),
    ]
    f32 = jnp.float32
    out_shape = [
        jax.ShapeDtypeStruct((B, S, C, Lp), f32),
        jax.ShapeDtypeStruct((B, S, C, Lp), f32),
        jax.ShapeDtypeStruct((BS, P, C), f32), jax.ShapeDtypeStruct((BS, P, C), f32),
        jax.ShapeDtypeStruct((BS, C, R), f32), jax.ShapeDtypeStruct((BS, C, R), f32),
        jax.ShapeDtypeStruct((BS, C, 1), f32), jax.ShapeDtypeStruct((BS, C, 1), f32),
        jax.ShapeDtypeStruct((BS, C, N), f32), jax.ShapeDtypeStruct((BS, C, N), f32),
        jax.ShapeDtypeStruct((BS, C, 1), f32), jax.ShapeDtypeStruct((BS, C, 1), f32),
    ]

    kernel = functools.partial(
        lambda *refs, R, N, lblk: _bwd_body(refs, R, N, lblk),
        R=R, N=N, lblk=lblk,
    )
    g32 = g.astype(f32)
    outs = pl.pallas_call(
        kernel,
        grid=(B, S, nL),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((C, N), f32), pltpu.VMEM((C, N), f32),
                        pltpu.VMEM((C, N), f32), pltpu.VMEM((C, N), f32)],
        interpret=jax.default_backend() != "tpu",
    )(xs2, xs2, g32, g32, ck_f, ck_r,
      Wx, Wx, Wdt, Wdt, bias3, bias3, A, A, D3, D3,
      E_f, E_r, F_f, F_r)

    (dx_f, dx_r, dwx_f, dwx_r, dwdt_f, dwdt_r, dbias_f, dbias_r,
     dA_f, dA_r, dD_f, dD_r) = outs

    dxs2 = (dx_f + dx_r)[..., :L].astype(xs2.dtype)

    def stack_dirs(pf, pr):
        # per-(b*S+s) partials -> (4, ...): k = s for f-parts, s+2 for r-parts
        pf = pf.reshape(B, S, *pf.shape[1:]).sum(axis=0)
        pr = pr.reshape(B, S, *pr.shape[1:]).sum(axis=0)
        return jnp.concatenate([pf, pr], axis=0)

    dWx = stack_dirs(dwx_f, dwx_r)
    dWdt = stack_dirs(dwdt_f, dwdt_r)
    dbias = stack_dirs(dbias_f, dbias_r)[..., 0]
    dA = stack_dirs(dA_f, dA_r)
    dD = stack_dirs(dD_f, dD_r)[..., 0]
    return dxs2, dWx, dWdt, dbias, dA, dD
