"""Per-sequence fused SS2D scan: split forward/reverse pallas calls.

The stacked-direction kernel (:mod:`bem_tpu.ops.ss2d_fused_g`) needs its
input as one (Bg, 2, G*C, L) array, which costs a full-size ``jnp.stack``
copy of both sequence orders, and it emits y_fwd / y_rev separately, which
costs a full-size XLA add. This module splits the two scan directions of ONE
sequence (row-major or col-major) into two pallas calls:

  1. the forward-direction call scans blocks left-to-right and writes y_f;
  2. the reverse-direction call scans blocks right-to-left, reads the
     already-final y_f block at the same L-position, and writes y_f + y_rev —
     the direction merge happens in-kernel for free.

The sequence arrays are consumed directly (row = a reshape of the CF
feature map, col = one XLA transpose), so the only HBM copies left around
the scan are the two roofline transposes for the column order.

Math is identical to ss2d_fused_g (in-kernel dt/B/C projections, additive
two-level blocked scan, fp32 carry, block-diagonal grouped weights).
Reference: selective_scan_fwd_kernel_oflex.cuh (fused scan),
csm_triton.py:278-391 (directional cross-scan), vmamba.py:658-661.

Backward: custom_vjp recomputes through a jnp composition
(:func:`_seq_pair_ref`) — the CF fused path is the serving path; training
shapes (128^2 patches) are cheap to recompute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ss2d_fused_g import (
    LBLK,
    SEG_ADD,
    W_CLAMP,
    _block_scan_add,
    _expand_onehots,
    _expand_weights,
    _softplus,
    mm_precision,
)

# direction indices in the reference cross2d order (csm_triton.py / vmamba
# CrossScan): 0 = row-major fwd, 1 = col-major fwd, 2 = row rev, 3 = col rev
PAIRS = {"row": (0, 2), "col": (1, 3)}


def _dir_body(refs, GR: int, GN: int, N: int, rev: bool, merge: bool,
              use_d: bool = True):
    refs = list(refs)
    (x_ref, wx, wdt, bias, A, D, ebn, ecn, E, Fb, eend) = refs[:11]
    i = 11
    yin_ref = refs[i] if merge else None
    i += int(merge)
    y_ref, h_ref = refs[i], refs[i + 1]

    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    x = x_ref[0].astype(jnp.float32)  # (G*C, LBLK)
    xdbl = jnp.dot(wx[0], x, preferred_element_type=jnp.float32)
    dtr = jnp.dot(wdt[0], xdbl[:GR], preferred_element_type=jnp.float32)
    dt = _softplus(dtr + bias[0])     # (G*C, LBLK)
    du = dt * x
    rows_B = xdbl[GR : GR + GN]       # (G*N, LBLK)
    rows_C = xdbl[GR + GN :]
    y = jnp.zeros_like(x)
    for n in range(N):
        B_bc = jnp.dot(ebn[n], rows_B, preferred_element_type=jnp.float32)
        C_bc = jnp.dot(ecn[n], rows_C, preferred_element_type=jnp.float32)
        w = jnp.maximum(dt * A[0, :, n : n + 1], W_CLAMP)
        b = du * B_bc
        a_pref, b_pref = _block_scan_add(w, b, E[...], Fb[...], rev)
        h = a_pref * h_ref[:, n : n + 1] + b_pref
        a_end = jnp.dot(a_pref, eend[...], preferred_element_type=jnp.float32)
        b_end = jnp.dot(b_pref, eend[...], preferred_element_type=jnp.float32)
        h_ref[:, n : n + 1] = a_end * h_ref[:, n : n + 1] + b_end
        y = y + C_bc * h
    if use_d:
        y = y + D[0] * x
    if merge:
        y = y + yin_ref[0].astype(jnp.float32)
    y_ref[0] = y.astype(y_ref.dtype)


def _run_dir(x, Wx_g, Wdt_g, bias_g, A_g, D_g, ebn, ecn, N: int, d: int,
             rev: bool, yin=None, lblk: int = LBLK, use_d: bool = True):
    """One scan direction over x (Bg, GC, Lp). Returns y (Bg, GC, Lp);
    if ``yin`` is given, y += yin (the in-kernel direction merge)."""
    Bg, GC, Lp = x.shape
    GP = Wx_g.shape[1]
    GN = ebn.shape[-1]
    GR = GP - 2 * GN
    nL = Lp // lblk
    last = nL - 1

    i = np.arange(lblk)
    sseg = np.arange(lblk // SEG_ADD)
    if rev:
        E = jnp.asarray((i[:, None] == sseg[None, :] * SEG_ADD).astype(np.float32))
        eend = jnp.zeros((lblk, 1), jnp.float32).at[0, 0].set(1.0)
    else:
        E = jnp.asarray(
            (i[:, None] == sseg[None, :] * SEG_ADD + SEG_ADD - 1).astype(np.float32))
        eend = jnp.zeros((lblk, 1), jnp.float32).at[lblk - 1, 0].set(1.0)
    Fb = jnp.asarray(((i[None, :] // SEG_ADD) == sseg[:, None]).astype(np.float32))

    if rev:
        x_spec = pl.BlockSpec((1, GC, lblk), lambda b, l: (b, 0, last - l),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((1, GC, lblk), lambda b, l: (b, 0, l),
                              memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec((1,) + shape, lambda b, l: (d,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    const = lambda arr: pl.BlockSpec(
        arr.shape, lambda b, l: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    in_specs = [
        x_spec,
        wspec((GP, GC)), wspec((GC, GR)), wspec((GC, 1)),
        wspec((GC, N)), wspec((GC, 1)),
        const(ebn), const(ecn), const(E), const(Fb), const(eend),
    ]
    operands = [x, Wx_g, Wdt_g, bias_g, A_g, D_g, ebn, ecn, E, Fb, eend]
    if yin is not None:
        in_specs.append(x_spec)  # same block order as the output
        operands.append(yin)

    kernel = functools.partial(
        lambda *refs, GR, GN, N, rev, merge, use_d: _dir_body(
            refs, GR, GN, N, rev, merge, use_d),
        GR=GR, GN=GN, N=N, rev=rev, merge=yin is not None, use_d=use_d,
    )
    with mm_precision(x.dtype):
        return pl.pallas_call(
            kernel,
            grid=(Bg, nL),
            in_specs=in_specs,
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct((Bg, GC, Lp), x.dtype),
            scratch_shapes=[pltpu.VMEM((GC, N), jnp.float32)],
            # the merge variant's extra y_f input block pushes the live set
            # just past the default 16M scoped-vmem budget at GC=320/
            # LBLK=2048; v5e has headroom above the default limit
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=jax.default_backend() != "tpu",
        )(*operands)


def _pick_col_rows(H: int, W: int, cap: int = 1536):
    """Rows per col-scan block: the largest t dividing H with t*W <= cap
    lanes and t*W divisible by 128 (the Mosaic partial-block rule); small
    images (H*W <= 4096) fall back to ONE whole-image block, which is
    always legal (lane dim == full array dim). None -> caller must take
    the transpose path. cap=1536 keeps the ~8 live (GC, t*W) fp32
    intermediates inside the ~16 MB/core VMEM at GC=320."""
    best = None
    for t in range(1, min(H, 8) + 1):
        if H % t == 0 and t * W <= cap and (t * W) % 128 == 0:
            best = t
    if best is None and H * W <= 4096:
        return H
    return best


def col_pair_supported(H: int, W: int) -> bool:
    """Whether the transpose-free column-pair kernel can run at (H, W)."""
    return _pick_col_rows(H, W) is not None


def _col_sum_body(refs, GR: int, GN: int, N: int, th: int, W: int):
    """BOTH column directions' per-column summaries in ONE top-down walk.

    The flattened col-major sequence carries state across columns (the end
    of column w feeds the entry of the next column visited), so the exact
    entry states need each column's end state ``send`` and total log-decay
    ``stot`` first. One pass over x computes them for both directions:

      - forward (cross2d dir 1, top-down within a column): the plain
        recurrence h_f = a_f·h_f + b_f carried down the slabs; send_f is the
        column-bottom state, stot_f = Σ_t w_f(t).
      - reverse (dir 3, bottom-up within a column): its column-TOP end state
        is a prefix-product accumulation evaluated in the SAME top-down
        walk — h_r(top) = Σ_t (∏_{s<t} a_r(s))·b_r(t), i.e.
        acc += P·b_r(t); P *= a_r(t) per row.

    No y is written — one x read replaces the two full local passes (the
    old local/fix split wrote and re-read the y stream twice per direction;
    traced at ~13 ms per L0 VSSBlock round 5).
    """
    (x_ref, wxf, wdtf, biasf, Af, wxr, wdtr, biasr, Ar, ebn,
     sendf_ref, stotf_ref, sendr_ref, stotr_ref,
     hf_ref, swf_ref, pr_ref, accr_ref, swr_ref) = refs

    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        hf_ref[...] = jnp.zeros_like(hf_ref)
        swf_ref[...] = jnp.zeros_like(swf_ref)
        pr_ref[...] = jnp.ones_like(pr_ref)
        accr_ref[...] = jnp.zeros_like(accr_ref)
        swr_ref[...] = jnp.zeros_like(swr_ref)

    x = x_ref[0].astype(jnp.float32)  # (GC, th*W) — th image rows
    for d, (wx, wdt, bias, A) in enumerate(
            ((wxf, wdtf, biasf, Af), (wxr, wdtr, biasr, Ar))):
        xdbl = jnp.dot(wx[0], x, preferred_element_type=jnp.float32)
        dtr = jnp.dot(wdt[0], xdbl[:GR], preferred_element_type=jnp.float32)
        dt = _softplus(dtr + bias[0])
        du = dt * x
        rows_B = xdbl[GR : GR + GN]
        for n in range(N):
            B_bc = jnp.dot(ebn[n], rows_B, preferred_element_type=jnp.float32)
            w = jnp.maximum(dt * A[0, :, n : n + 1], W_CLAMP)
            a = jnp.exp(w)
            b = du * B_bc
            nsl = slice(n * W, (n + 1) * W)
            if d == 0:
                h = hf_ref[:, nsl]
                sw = swf_ref[:, nsl]
                for t in range(th):
                    sl = slice(t * W, (t + 1) * W)
                    h = a[:, sl] * h + b[:, sl]
                    sw = sw + w[:, sl]
                hf_ref[:, nsl] = h
                swf_ref[:, nsl] = sw
                sendf_ref[0, :, nsl] = h
                stotf_ref[0, :, nsl] = sw
            else:
                P = pr_ref[:, nsl]
                acc = accr_ref[:, nsl]
                sw = swr_ref[:, nsl]
                for t in range(th):
                    sl = slice(t * W, (t + 1) * W)
                    acc = acc + P * b[:, sl]
                    P = P * a[:, sl]
                    sw = sw + w[:, sl]
                pr_ref[:, nsl] = P
                accr_ref[:, nsl] = acc
                swr_ref[:, nsl] = sw
                sendr_ref[0, :, nsl] = acc
                stotr_ref[0, :, nsl] = sw


def _col_body(refs, GR: int, GN: int, N: int, rev: bool, merge: bool,
              th: int, W: int, use_d: bool = True):
    """One column direction's FULL scan over th-row slabs of the row-major
    stream, given the per-column entry states ``sinit`` (from
    :func:`_col_sum_body` + the tiny cross-column scan). The per-column
    recurrence h = a·h + b starts from sinit and costs one FMA pass per
    image row with all W columns in parallel lanes; y = C·h (+ D·x,
    + yin merge) is written in the same pass."""
    refs = list(refs)
    (x_ref, wx, wdt, bias, A, D, ebn, ecn, sinit_ref) = refs[:9]
    i = 9
    yin_ref = refs[i] if merge else None
    i += int(merge)
    y_ref = refs[i]
    h_ref = refs[i + 1]

    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        h_ref[...] = sinit_ref[0].astype(jnp.float32)

    x = x_ref[0].astype(jnp.float32)  # (GC, th*W) — th image rows
    xdbl = jnp.dot(wx[0], x, preferred_element_type=jnp.float32)
    dtr = jnp.dot(wdt[0], xdbl[:GR], preferred_element_type=jnp.float32)
    dt = _softplus(dtr + bias[0])
    du = dt * x
    rows_B = xdbl[GR : GR + GN]
    rows_C = xdbl[GR + GN :]
    y = jnp.zeros_like(x)
    order = list(range(th - 1, -1, -1) if rev else range(th))
    for n in range(N):
        B_bc = jnp.dot(ebn[n], rows_B, preferred_element_type=jnp.float32)
        C_bc = jnp.dot(ecn[n], rows_C, preferred_element_type=jnp.float32)
        w = jnp.maximum(dt * A[0, :, n : n + 1], W_CLAMP)
        a = jnp.exp(w)
        b = du * B_bc
        nsl = slice(n * W, (n + 1) * W)
        pieces = [None] * th
        h = h_ref[:, nsl]
        for t in order:
            sl = slice(t * W, (t + 1) * W)
            h = a[:, sl] * h + b[:, sl]
            pieces[t] = C_bc[:, sl] * h
        h_ref[:, nsl] = h
        y = y + jnp.concatenate(pieces, axis=1)
    if use_d:
        y = y + D[0] * x
    if merge:
        y = y + yin_ref[0].astype(jnp.float32)
    y_ref[0] = y.astype(y_ref.dtype)


def _run_col_sum(x, Wx_g, Wdt_g, bias_g, A_g, ebn, N: int, d_f: int,
                 d_r: int, H: int, W: int, th: int):
    """Both-direction column-summary pass over the ROW-major stream x
    (Bg, GC, H*W). One top-down walk; returns
    (send_f, stot_f, send_r, stot_r), each (Bg, GC, N*W) fp32."""
    Bg, GC, L = x.shape
    GP = Wx_g.shape[1]
    GN = ebn.shape[-1]
    GR = GP - 2 * GN
    nH = H // th
    blk = th * W

    x_spec = pl.BlockSpec((1, GC, blk), lambda b, l: (b, 0, l),
                          memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, GC, N * W), lambda b, l: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def wspec(shape, d):
        return pl.BlockSpec((1,) + shape, lambda b, l, d=d: (d,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    const = lambda arr: pl.BlockSpec(
        arr.shape, lambda b, l: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    in_specs = [
        x_spec,
        wspec((GP, GC), d_f), wspec((GC, GR), d_f), wspec((GC, 1), d_f),
        wspec((GC, N), d_f),
        wspec((GP, GC), d_r), wspec((GC, GR), d_r), wspec((GC, 1), d_r),
        wspec((GC, N), d_r),
        const(ebn),
    ]
    operands = [x, Wx_g, Wdt_g, bias_g, A_g, Wx_g, Wdt_g, bias_g, A_g, ebn]

    kernel = functools.partial(
        lambda *refs, GR, GN, N, th, W: _col_sum_body(refs, GR, GN, N, th, W),
        GR=GR, GN=GN, N=N, th=th, W=W,
    )
    sum_shape = jax.ShapeDtypeStruct((Bg, GC, N * W), jnp.float32)
    with mm_precision(x.dtype):
        return pl.pallas_call(
            kernel,
            grid=(Bg, nH),
            in_specs=in_specs,
            out_specs=[col_spec] * 4,
            out_shape=[sum_shape] * 4,
            scratch_shapes=[pltpu.VMEM((GC, N * W), jnp.float32)] * 5,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=jax.default_backend() != "tpu",
        )(*operands)


def _run_col_dir(x, Wx_g, Wdt_g, bias_g, A_g, D_g, ebn, ecn, N: int, d: int,
                 rev: bool, H: int, W: int, th: int,
                 sinit=None, yin=None, use_d: bool = True):
    """One COLUMN-direction full-scan pass over the ROW-major stream x
    (Bg, GC, H*W). The grid walks th-row slabs top-to-bottom (bottom-up
    when rev); the per-column state (GC, N*W) carries between slabs in
    scratch, initialized from ``sinit``. If ``yin`` is given, y += yin."""
    Bg, GC, L = x.shape
    GP = Wx_g.shape[1]
    GN = ebn.shape[-1]
    GR = GP - 2 * GN
    nH = H // th
    last = nH - 1
    blk = th * W

    if rev:
        x_spec = pl.BlockSpec((1, GC, blk), lambda b, l: (b, 0, last - l),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((1, GC, blk), lambda b, l: (b, 0, l),
                              memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, GC, N * W), lambda b, l: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec((1,) + shape, lambda b, l: (d,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    const = lambda arr: pl.BlockSpec(
        arr.shape, lambda b, l: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    in_specs = [
        x_spec,
        wspec((GP, GC)), wspec((GC, GR)), wspec((GC, 1)),
        wspec((GC, N)), wspec((GC, 1)),
        const(ebn), const(ecn),
        col_spec,
    ]
    operands = [x, Wx_g, Wdt_g, bias_g, A_g, D_g, ebn, ecn, sinit]
    if yin is not None:
        in_specs.append(x_spec)
        operands.append(yin)

    kernel = functools.partial(
        lambda *refs, GR, GN, N, rev, merge, th, W, use_d: _col_body(
            refs, GR, GN, N, rev, merge, th, W, use_d),
        GR=GR, GN=GN, N=N, rev=rev, merge=yin is not None,
        th=th, W=W, use_d=use_d,
    )
    with mm_precision(x.dtype):
        return pl.pallas_call(
            kernel,
            grid=(Bg, nH),
            in_specs=in_specs,
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct((Bg, GC, L), x.dtype),
            scratch_shapes=[pltpu.VMEM((GC, N * W), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=jax.default_backend() != "tpu",
        )(*operands)


def _col_cross_scan(send, stot, N: int, W: int, rev: bool):
    """Column entry states from per-column summaries: the tiny cross-column
    recurrence s_init(w) = totA(w∓1)·s_init(w∓1) + send(w∓1) over the W
    columns (the flattened col-major sequence enters column w with the end
    state of the previously-visited column). send/stot: (Bg, GC, N*W)."""
    Bg, GC, _ = send.shape
    totA = jnp.exp(stot)
    # (Bg, GC, N, W) -> (Bg, W, GC*N): the scan axis must be -2
    aT = jnp.moveaxis(totA.reshape(Bg, GC, N, W), 3, 1).reshape(Bg, W, GC * N)
    bT = jnp.moveaxis(send.reshape(Bg, GC, N, W), 3, 1).reshape(Bg, W, GC * N)
    from .scan import linear_scan

    s_inc = linear_scan(aT, bT, reverse=rev)  # inclusive end-state per column
    zero = jnp.zeros_like(s_inc[:, :1])
    if rev:  # column w enters with column w+1's (inclusive) end state
        s_init = jnp.concatenate([s_inc[:, 1:], zero], axis=1)
    else:
        s_init = jnp.concatenate([zero, s_inc[:, :-1]], axis=1)
    return jnp.moveaxis(
        s_init.reshape(Bg, W, GC, N), 1, 3).reshape(Bg, GC, N * W)


def _seq_pair_ref(xseq, Wx, Wdt, bias, A, D, d_f: int, d_r: int):
    """jnp composition oracle for one sequence pair (no grouping).

    xseq: (B, C, L) fp-anything. Returns fwd(d_f) + rev(d_r) in original
    positions, fp32 math, cast back to xseq.dtype."""
    from .scan import linear_scan

    B, C, L = xseq.shape
    P = Wx.shape[1]
    N = A.shape[-1]
    R = P - 2 * N
    out = jnp.zeros((B, C, L), jnp.float32)
    x = xseq.astype(jnp.float32)
    for k, rev in ((d_f, False), (d_r, True)):
        # the projections are per-position, so the reverse direction runs as
        # a native reverse scan on the unflipped arrays — no jnp.flip
        # round-trips (three full-array flips cost ~50 ms/train-iter before
        # this, measured). backend=None -> auto (pallas on TPU): the xla
        # associative_scan here cost 1.1 s/train-iter in stride-2 slice/pad
        # ops (measured, PLAN.md r4 s2).
        xdbl = jnp.einsum("pc,bcl->bpl", Wx[k].astype(jnp.float32), x)
        dt = jax.nn.softplus(
            jnp.einsum("cr,brl->bcl", Wdt[k].astype(jnp.float32), xdbl[:, :R])
            + bias[k].astype(jnp.float32)[None, :, None]
        )
        a = jnp.exp(dt[..., None] * A[k].astype(jnp.float32)[None, :, None, :])
        b = (dt * x)[..., None] * jnp.moveaxis(
            xdbl[:, R : R + N], 1, 2)[:, None, :, :]
        a2 = jnp.moveaxis(a, 2, 1).reshape(B, L, C * N)
        b2 = jnp.moveaxis(b, 2, 1).reshape(B, L, C * N)
        h = linear_scan(a2, b2, reverse=rev).reshape(B, L, C, N)
        Cs = jnp.moveaxis(xdbl[:, R + N :], 1, 2)
        y = jnp.einsum("blcn,bln->bcl", h, Cs)
        y = y + D[k].astype(jnp.float32)[None, :, None] * x
        out = out + y
    return out.astype(xseq.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def ss2d_seq_pair_g(xseq_g, Wx, Wdt, bias, A, D, G: int, pair: str):
    """Both scan directions of one sequence, grouped, direction-merged.

    xseq_g: (B/G, G*C, L) — a pure reshape of the (B, C, L) sequence (row
    order: reshape of the CF feature map; col order: one transpose).
    Wx (4, R+2N, C), Wdt (4, C, R), bias (4, C), A (4, C, N), D (4, C)
    per-direction weights; ``pair`` selects which two directions run
    ("row" -> 0/2, "col" -> 1/3, cross2d order).
    Returns (B/G, G*C, L): y_fwd + y_rev in original sequence positions.
    """
    d_f, d_r = PAIRS[pair]
    C = Wx.shape[-1]
    N = A.shape[-1]
    Bg, GC, L = xseq_g.shape
    # both directions of a pair scan the SAME x sequence, so their D*x
    # skip terms are one combined FMA: the forward kernel skips D and the
    # reverse (merging) kernel applies D_f + D_r — one full-width pass saved
    D2 = D.at[d_r].add(D[d_f])
    Wx_g, Wdt_g, bias_g, A_g, D_g = _expand_weights(Wx, Wdt, bias, A, D2, G)
    ebn = _expand_onehots(G, C, N)

    import os

    # sweep hook: sequence lanes per kernel block (queued TPU experiment —
    # the round-2 LBLK sweep was cut short by a degraded compile service)
    lblk_cap = int(os.environ.get("BEM_SCAN_LBLK", LBLK))
    lblk = min(lblk_cap, -(-L // 128) * 128)
    Lp = -(-L // lblk) * lblk
    x = xseq_g
    if Lp != L:
        # zero-padding is scan-neutral: x=0 -> b = dt*x*B = 0, so the state
        # is unchanged through the pad (the reverse scan enters real data
        # with h = 0)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Lp - L)))

    y_f = _run_dir(x, Wx_g, Wdt_g, bias_g, A_g, D_g, ebn, ebn, N, d_f,
                   rev=False, lblk=lblk, use_d=False)
    y = _run_dir(x, Wx_g, Wdt_g, bias_g, A_g, D_g, ebn, ebn, N, d_r,
                 rev=True, yin=y_f, lblk=lblk)
    return y[..., :L]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def ss2d_col_pair_g(xrow_g, Wx, Wdt, bias, A, D, y0, G: int, H: int, W: int):
    """Both COLUMN scan directions (cross2d dirs 1/3), transpose-free.

    Consumes the same ROW-major grouped stream as the "row" pair and
    returns row-major output, so the (Bg, GC, L) <-> (Bg, GC, W, H)
    transpose round-trip of the naive col path disappears entirely (it
    cost ~150 ms/serving-iter in XLA retiles, traced round 4). The column
    recurrence runs native: the grid walks th-row slabs of the image
    (bottom-up for dir 3) and each slab costs ONE FMA pass per row with
    all W columns in parallel lanes — per-column scans are independent,
    so no doubling scan is needed either.

    Three kernel passes total (round-5 restructure; the old local/fix
    split took four and re-read the y stream twice): ONE summary pass
    computes both directions' per-column end states and log-decays
    (:func:`_col_sum_body`), two tiny cross-column scans turn them into
    exact column entry states, then one FULL scan per direction runs the
    recurrence from those entry states and writes y directly.

    ``y0`` (optional, same (Bg, GC, L) layout) is merged into the first
    full-scan pass — callers hand the ROW pair's output here so the
    direction merge costs no separate read downstream (the tail then
    consumes ONE merged stream instead of two).

    Caller must check :func:`col_pair_supported`(H, W) and fall back to
    transpose + ss2d_seq_pair_g(pair="col") otherwise.
    """
    d_f, d_r = PAIRS["col"]
    C = Wx.shape[-1]
    N = A.shape[-1]
    th = _pick_col_rows(H, W)
    assert th is not None, (
        f"no col-scan row blocking for H={H}, W={W}; callers must check "
        "col_pair_supported() and take the transpose path")
    # both directions scan the SAME x, so the D*x skip terms fold into the
    # first full-scan kernel — one full-width pass saved (as in the pair)
    D2 = D.at[d_f].add(D[d_r])
    Wx_g, Wdt_g, bias_g, A_g, D_g = _expand_weights(Wx, Wdt, bias, A, D2, G)
    ebn = _expand_onehots(G, C, N)
    send_f, stot_f, send_r, stot_r = _run_col_sum(
        xrow_g, Wx_g, Wdt_g, bias_g, A_g, ebn, N, d_f, d_r, H, W, th)
    sinit_f = _col_cross_scan(send_f, stot_f, N, W, rev=False)
    sinit_r = _col_cross_scan(send_r, stot_r, N, W, rev=True)
    args = (Wx_g, Wdt_g, bias_g, A_g, D_g, ebn, ebn, N)
    y = _run_col_dir(xrow_g, *args, d_f, rev=False, H=H, W=W, th=th,
                     sinit=sinit_f, yin=y0)
    return _run_col_dir(xrow_g, *args, d_r, rev=True, H=H, W=W, th=th,
                        sinit=sinit_r, yin=y, use_d=False)


def _col_vjp_fwd(xrow_g, Wx, Wdt, bias, A, D, y0, G, H, W):
    y = ss2d_col_pair_g(xrow_g, Wx, Wdt, bias, A, D, y0, G, H, W)
    return y, (xrow_g, Wx, Wdt, bias, A, D, y0 is not None)


def _col_vjp_bwd(G, H, W, res, g):
    xrow_g, Wx, Wdt, bias, A, D, has_y0 = res
    d_f, d_r = PAIRS["col"]
    Bg, GC, L = xrow_g.shape
    C = GC // G
    # recompute through the composition on the col-major view (these two
    # transposes run at TRAIN patch sizes only — the serving fwd is
    # transpose-free)
    xT = jnp.transpose(
        xrow_g.reshape(Bg * G, C, H, W), (0, 1, 3, 2)).reshape(Bg * G, C, L)
    gT = jnp.transpose(
        g.reshape(Bg * G, C, H, W), (0, 1, 3, 2)).reshape(Bg * G, C, L)
    _, vjp = jax.vjp(
        lambda x, wx, wdt, b, a, d: _seq_pair_ref(x, wx, wdt, b, a, d, d_f, d_r),
        xT, Wx, Wdt, bias, A, D,
    )
    dxT, dWx, dWdt, dbias, dA, dD = vjp(gT)
    dx = jnp.transpose(
        dxT.reshape(Bg * G, C, W, H), (0, 1, 3, 2)).reshape(Bg, GC, L)
    # the y0 merge is a plain add: its cotangent is g itself
    dy0 = g if has_y0 else None
    return dx, dWx, dWdt, dbias, dA, dD, dy0


ss2d_col_pair_g.defvjp(_col_vjp_fwd, _col_vjp_bwd)


def _vjp_fwd(xseq_g, Wx, Wdt, bias, A, D, G, pair):
    y = ss2d_seq_pair_g(xseq_g, Wx, Wdt, bias, A, D, G, pair)
    return y, (xseq_g, Wx, Wdt, bias, A, D)


def _vjp_bwd(G, pair, res, g):
    xseq_g, Wx, Wdt, bias, A, D = res
    d_f, d_r = PAIRS[pair]
    Bg, GC, L = xseq_g.shape
    C = GC // G
    xs = xseq_g.reshape(Bg * G, C, L)
    gy = g.reshape(Bg * G, C, L)
    _, vjp = jax.vjp(
        lambda x, wx, wdt, b, a, d: _seq_pair_ref(x, wx, wdt, b, a, d, d_f, d_r),
        xs, Wx, Wdt, bias, A, D,
    )
    dx, dWx, dWdt, dbias, dA, dD = vjp(gy)
    return dx.reshape(Bg, GC, L), dWx, dWdt, dbias, dA, dD


ss2d_seq_pair_g.defvjp(_vjp_fwd, _vjp_bwd)
