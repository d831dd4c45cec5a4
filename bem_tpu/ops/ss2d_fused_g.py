"""Batch-grouped fully-fused SS2D kernel (v3).

Same math as :mod:`bem_tpu.ops.ss2d_fused` (projections + bidirectional scan
+ readout in one Pallas kernel) but with G batch images folded into the
SUBLANE dimension — a pure reshape on both ends, because batch is the
outermost axis: (B, 2, C, L) == (B/G, 2, G*C, L).

Why (measured on v5e, tools/microbench_vpu.py):
- the VPU is the hard floor for this op and saturates regardless of block
  geometry, so grouping does not change the elementwise cost — but every
  grid step also issues ~8 small MXU dots whose fixed pipeline cost rivals
  the scan itself at 8960 steps; grouping cuts the step count by G.
- jax.nn.softplus measured 4x the cost of exp on the VPU; the kernel uses
  the manual max(x,0)+log1p(exp(-|x|)) form.
- the cross-segment broadcast uses pltpu.roll+repeat instead of an
  (nseg, LBLK) one-hot matmul, halving the constant-matrix VMEM.

Per-image weights are expanded to block-diagonal (kron with I_G) once per
call — tiny (G*P x G*C) host-side math that keeps every in-kernel op a
single full-width matmul or (G*C, LBLK) VPU pass.

Reference: selective_scan_fwd_kernel_oflex.cuh (fused scan),
csm_triton.py:278-391 (directional scan), vmamba.py:658-661 (projections).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ss2d_fused import mm_precision, ss2d_dir_fused

LBLK = 2048  # 22.9 -> 21.8 ms at GC=160 (sweep in PLAN.md)


def _roll(x, shift, axis=1):
    n = x.shape[axis]
    return pltpu.roll(x, shift % n, axis=axis)


def _softplus(x):
    # max(x,0) + log1p(exp(-|x|)): ~4x cheaper than jax.nn.softplus on VPU
    return jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x)))


SEG_ADD = 8      # additive-scan segment length
W_CLAMP = -10.0  # per-lane log-decay clamp: exp(-10) = 4.5e-5 decay is an
                 # effective state reset already; bounds the within-segment
                 # log range to SEG_ADD*W_CLAMP = -80 so exp(+80)*b stays
                 # inside fp32 (selective_scan_fwd_kernel_oflex.cuh keeps
                 # fp32 state; same tolerance class as its expf pipeline)


def _seg_scan_add(w, b, reverse: bool):
    """Within-SEG_ADD-segment inclusive (a, b) scan via ADDITIVE doublings.

    w = log-decay (dt*A, clamped), b = input. Instead of scanning the
    (a, b) multiply-add monoid (7 VPU passes per doubling x log2(SUB)),
    scan two ADDITIVE sequences (3 passes per doubling):
      S = segwise-cumsum(w);  P = exp(S)        (within-seg decay products)
      hseg = P * segwise-cumsum(b * exp(-S))    (within-seg scan output)
    Returns (P, hseg) — same contract as _seg_scan on SEG_ADD segments.

    MEASURED dead ends (round 4): (a) BEM_SCAN_MXU_CUMSUM, deleted — running
    the two cumsums as MXU dots against a block-diagonal segment-triangular
    (LBLK, LBLK) matrix OOMs the Mosaic kernel vmem stack, and is
    structurally hopeless anyway — the 8-wide diagonal blocks make the
    1024-wide full-precision dot waste 128x of the MXU's work on zeros.
    (b) lowering the shifted views as zero-concat + misaligned slices (the
    form that beat pltpu.roll in the gdmlp tap loop) is a tie here (48.32 vs
    48.63 ms/pair-call) — the roll form stays.
    """
    col = jax.lax.broadcasted_iota(jnp.int32, (1, w.shape[1]), 1) % SEG_ADD
    # float keep-masks: the doubling update becomes ONE fma
    # (y += y_sh * maskf) instead of select + add — 2 passes per doubling
    # instead of 3. The (1, LBLK) mask rows broadcast over sublanes and are
    # computed once per kernel call.
    maskf = {}
    s = 1
    while s < SEG_ADD:
        if reverse:
            keep = col < SEG_ADD - s
        else:
            keep = col >= s
        maskf[s] = keep.astype(jnp.float32)
        s *= 2

    def cumsum_seg(x):
        s = 1
        y = x
        while s < SEG_ADD:
            y_sh = _roll(y, -s if reverse else s)
            y = y + y_sh * maskf[s]
            s *= 2
        return y

    S = cumsum_seg(w)
    P = jnp.exp(S)
    # 1/P instead of exp(-S): one reciprocal pass replaces a second
    # transcendental; S <= 0 so P in [exp(SEG_ADD*W_CLAMP), 1] and the
    # reciprocal stays inside fp32 exactly like exp(-S) did
    q = cumsum_seg(b * (1.0 / P))
    return P, P * q


def _small_scan(a, b, reverse: bool):
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


def _block_scan_add(w, b, E, Fb, reverse: bool):
    """Two-level inclusive scan over LBLK lanes with the ADDITIVE level-1
    (_seg_scan_add, SEG_ADD segments); level 2 keeps the (a, b) monoid
    doubling on the small (C', nseg) aggregates."""
    nseg = w.shape[1] // SEG_ADD
    a1, b1 = _seg_scan_add(w, b, reverse)
    a_seg = jnp.dot(a1, E, preferred_element_type=jnp.float32)  # (C', nseg)
    b_seg = jnp.dot(b1, E, preferred_element_type=jnp.float32)
    a_sc, b_sc = _small_scan(a_seg, b_seg, reverse)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, nseg), 1)
    if reverse:
        pa = _roll(a_sc, -1)
        pb = _roll(b_sc, -1)
        border = col == nseg - 1
    else:
        pa = _roll(a_sc, 1)
        pb = _roll(b_sc, 1)
        border = col == 0
    pa = jnp.where(border, 1.0, pa)
    pb = jnp.where(border, 0.0, pb)
    pa = jnp.dot(pa, Fb, preferred_element_type=jnp.float32)  # (C', LBLK)
    pb = jnp.dot(pb, Fb, preferred_element_type=jnp.float32)
    return a1 * pa, a1 * pb + b1


def _fwd_body(refs, GR: int, GN: int, N: int):
    (xf_ref, xr_ref, wx_f, wx_r, wdt_f, wdt_r, bias_f, bias_r, a_f, a_r,
     d_f, d_r, ebn, ecn, ef, er, fb, eend_f, eend_r,
     yf_ref, yr_ref, hf_ref, hr_ref) = refs

    li = pl.program_id(2)

    @pl.when(li == 0)
    def _():
        hf_ref[...] = jnp.zeros_like(hf_ref)
        hr_ref[...] = jnp.zeros_like(hr_ref)

    def one_dir(x_ref, wx, wdt, bias, A, D, ebn, ecn, E, Eend, h_ref, y_ref,
                rev):
        Fb = fb[...]
        x = x_ref[0, 0].astype(jnp.float32)  # (G*C, LBLK)
        xdbl = jnp.dot(wx[0], x, preferred_element_type=jnp.float32)
        dtr = jnp.dot(wdt[0], xdbl[:GR], preferred_element_type=jnp.float32)
        dt = _softplus(dtr + bias[0])        # (G*C, LBLK)
        du = dt * x
        rows_B = xdbl[GR : GR + GN]          # (G*N, LBLK)
        rows_C = xdbl[GR + GN :]
        y = jnp.zeros_like(x)
        for n in range(N):
            B_bc = jnp.dot(ebn[n], rows_B, preferred_element_type=jnp.float32)
            C_bc = jnp.dot(ecn[n], rows_C, preferred_element_type=jnp.float32)
            w = jnp.maximum(dt * A[0, :, n : n + 1], W_CLAMP)
            b = du * B_bc
            a_pref, b_pref = _block_scan_add(w, b, E[...], Fb, rev)
            h = a_pref * h_ref[:, n : n + 1] + b_pref
            # carry to the next block: h at each image's boundary lane
            a_end = jnp.dot(a_pref, Eend[...], preferred_element_type=jnp.float32)
            b_end = jnp.dot(b_pref, Eend[...], preferred_element_type=jnp.float32)
            h_ref[:, n : n + 1] = a_end * h_ref[:, n : n + 1] + b_end
            y = y + C_bc * h
        y = y + D[0] * x
        y_ref[0, 0] = y.astype(y_ref.dtype)

    one_dir(xf_ref, wx_f, wdt_f, bias_f, a_f, d_f, ebn, ecn, ef, eend_f,
            hf_ref, yf_ref, False)
    one_dir(xr_ref, wx_r, wdt_r, bias_r, a_r, d_r, ebn, ecn, er, eend_r,
            hr_ref, yr_ref, True)


def _expand_weights(Wx, Wdt, bias, A, D, G):
    """Per-image (4, P, C)-family weights -> block-diagonal grouped forms."""
    K, P, C = Wx.shape
    N = A.shape[-1]
    R = P - 2 * N
    eye = jnp.eye(G, dtype=Wx.dtype)

    def bd(M):  # (K, r, c) -> (K, G*r, G*c) block-diag
        return jax.vmap(lambda m: jnp.kron(eye, m))(M)

    Wx_g = jnp.concatenate(
        [bd(Wx[:, :R]), bd(Wx[:, R : R + N]), bd(Wx[:, R + N :])], axis=1
    )  # (K, G*P, G*C) rows grouped [dt | B | C]
    Wdt_g = bd(Wdt)                      # (K, G*C, G*R)
    bias_g = jnp.tile(bias, (1, G)).reshape(K, G * C, 1)
    A_g = jnp.tile(A, (1, G, 1))         # (K, G*C, N)
    D_g = jnp.tile(D, (1, G)).reshape(K, G * C, 1)
    return Wx_g, Wdt_g, bias_g, A_g, D_g


def _expand_onehots(G, C, N):
    """Row-expansion one-hots: (N, G*C, G*N) mapping row g*N+n -> channels
    g*C..(g+1)*C for that n."""
    e = np.zeros((N, G * C, G * N), np.float32)
    for n in range(N):
        for g in range(G):
            e[n, g * C : (g + 1) * C, g * N + n] = 1.0
    return jnp.asarray(e)


def _run_fwd_g(xs2g, Wx_g, Wdt_g, bias_g, A_g, D_g, ebn, ecn, N, lblk=LBLK):
    Bg, S, GC, L = xs2g.shape
    GP = Wx_g.shape[1]
    GN = ebn.shape[-1]
    GR = GP - 2 * GN

    lblk = min(lblk, -(-L // 128) * 128)
    Lp = -(-L // lblk) * lblk
    if Lp != L:
        xs2g = jnp.pad(xs2g, ((0, 0), (0, 0), (0, 0), (0, Lp - L)))
    nL = Lp // lblk
    # segment-end extraction / prefix-broadcast one-hots at SEG_ADD
    # granularity (the additive level-1 scan)
    i = np.arange(lblk)
    sseg = np.arange(lblk // SEG_ADD)
    E_f = jnp.asarray(
        (i[:, None] == (sseg[None, :] * SEG_ADD + SEG_ADD - 1)).astype(np.float32))
    E_r = jnp.asarray((i[:, None] == (sseg[None, :] * SEG_ADD)).astype(np.float32))
    Fb = jnp.asarray(((i[None, :] // SEG_ADD) == sseg[:, None]).astype(np.float32))

    # boundary-lane extraction (single image per lane range here: G on
    # sublanes, so the block boundary is just the last/first lane)
    eend_f = jnp.zeros((lblk, 1), jnp.float32).at[lblk - 1, 0].set(1.0)
    eend_r = jnp.zeros((lblk, 1), jnp.float32).at[0, 0].set(1.0)

    last = nL - 1
    x_spec_f = pl.BlockSpec((1, 1, GC, lblk), lambda b, s, l: (b, s, 0, l),
                            memory_space=pltpu.VMEM)
    x_spec_r = pl.BlockSpec((1, 1, GC, lblk),
                            lambda b, s, l: (b, s, 0, last - l),
                            memory_space=pltpu.VMEM)

    def wspec(shape, off):
        return pl.BlockSpec((1,) + shape,
                            lambda b, s, l, o=off: (s + o,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    const = lambda arr: pl.BlockSpec(
        arr.shape, lambda b, s, l: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    in_specs = [
        x_spec_f, x_spec_r,
        wspec((GP, GC), 0), wspec((GP, GC), 2),
        wspec((GC, GR), 0), wspec((GC, GR), 2),
        wspec((GC, 1), 0), wspec((GC, 1), 2),
        wspec((GC, N), 0), wspec((GC, N), 2),
        wspec((GC, 1), 0), wspec((GC, 1), 2),
        const(ebn), const(ecn),
        const(E_f), const(E_r), const(Fb), const(eend_f), const(eend_r),
    ]
    out_specs = [x_spec_f, x_spec_r]
    out_shape = [
        jax.ShapeDtypeStruct((Bg, S, GC, Lp), xs2g.dtype),
        jax.ShapeDtypeStruct((Bg, S, GC, Lp), xs2g.dtype),
    ]

    kernel = functools.partial(
        lambda *refs, GR, GN, N: _fwd_body(refs, GR, GN, N),
        GR=GR, GN=GN, N=N,
    )
    with mm_precision(xs2g.dtype):
        y_f, y_r = pl.pallas_call(
            kernel,
            grid=(Bg, S, nL),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((GC, N), jnp.float32),
                            pltpu.VMEM((GC, N), jnp.float32)],
            interpret=jax.default_backend() != "tpu",
        )(xs2g, xs2g, Wx_g, Wx_g, Wdt_g, Wdt_g, bias_g, bias_g, A_g, A_g,
          D_g, D_g, ebn, ecn, E_f, E_r, Fb, eend_f, eend_r)

    y2 = (y_f.astype(jnp.float32) + y_r.astype(jnp.float32))[..., :L]
    return y2.astype(xs2g.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def ss2d_dir_fused_g(xs2g, Wx, Wdt, bias, A, D, G: int):
    """Grouped fused SS2D directional core.

    xs2g: (B/G, 2, G*C, L) — a pure reshape of the (B, 2, C, L) layout.
    Returns y2g (B/G, 2, G*C, L); semantics identical to
    :func:`bem_tpu.ops.ss2d_fused.ss2d_dir_fused` after reshaping.
    """
    C = Wx.shape[-1]
    N = A.shape[-1]
    Wx_g, Wdt_g, bias_g, A_g, D_g = _expand_weights(Wx, Wdt, bias, A, D, G)
    ebn = _expand_onehots(G, C, N)
    return _run_fwd_g(xs2g, Wx_g, Wdt_g, bias_g, A_g, D_g, ebn, ebn, N)


def _vjp_fwd(xs2g, Wx, Wdt, bias, A, D, G):
    y = ss2d_dir_fused_g(xs2g, Wx, Wdt, bias, A, D, G)
    return y, (xs2g, Wx, Wdt, bias, A, D)


def _vjp_bwd(G, res, g):
    xs2g, Wx, Wdt, bias, A, D = res
    Bg, S, GC, L = xs2g.shape
    C = GC // G
    xs2 = xs2g.reshape(Bg, S, G, C, L)
    xs2 = jnp.moveaxis(xs2, 2, 1).reshape(Bg * G, S, C, L)
    gy = g.reshape(Bg, S, G, C, L)
    gy = jnp.moveaxis(gy, 2, 1).reshape(Bg * G, S, C, L)
    _, vjp = jax.vjp(ss2d_dir_fused, xs2, Wx, Wdt, bias, A, D)
    dxs2, dWx, dWdt, dbias, dA, dD = vjp(gy)
    dxs2 = jnp.moveaxis(dxs2.reshape(Bg, G, S, C, L), 1, 2)
    return dxs2.reshape(Bg, S, GC, L), dWx, dWdt, dbias, dA, dD


ss2d_dir_fused_g.defvjp(_vjp_fwd, _vjp_bwd)


def pick_group(B: int, C: int, max_sublanes: int = 256) -> int:
    """Largest G dividing B with G*C within the sublane budget."""
    for g in (8, 4, 2):
        if B % g == 0 and g * C <= max_sublanes:
            return g
    return 1
