"""Fused channel-first gated-dconv MLP (gdMlp) Pallas kernel.

The unfused gdMlp (vmamba.py:116-133: 1x1 conv -> depthwise 3x3 -> chunk ->
GELU(x1)*x2 -> 1x1 conv) materializes a 2h-channel hidden activation that is
8x the residual stream — at L0 serving shapes that is ~3 GB of HBM traffic
per direction through four XLA ops. This kernel runs the whole MLP in one
pallas program over channel-first (C, k·W) row-blocks:

  hid  = W1 @ x + b1                     (MXU, fp32 accum)
  conv = sum_{dy,dx} dw[:,dy,dx] * shift(hid)  (static lane-slices of a
          (k+2)-row hidden block: dy taps are whole-row offsets, dx taps are
          +-1 lane offsets with row-edge masks — no HBM round-trip)
  out  = W2 @ (gelu_exact(conv[:h]) * conv[h:]) + b2   (MXU)

The one-row halos are recomputed from the neighbouring x row-blocks (three
BlockSpecs over the same operand), which costs 2 extra rows of the cheap
W1 matmul instead of any inter-block communication. Zero conv padding at the
image borders is enforced with a row-validity mask folded into the bias add.

Backward: custom_vjp recomputes through the jnp composition (_gdmlp_ref).
Reference semantics: basicsr/vmamba/models/vmamba.py:116-133 (gdMlp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ss2d_fused import mm_precision

def _gelu_exact(x):
    """Exact (erf) GELU, Mosaic-lowerable.

    Mosaic has no erf/erfc primitive (KernelType.TC lowering raises), so on
    the compiled path erf comes from Abramowitz & Stegun 7.1.25 (3-term
    rational in 1/(1+p|z|) times exp(-z^2), max abs error 2.5e-5) — a decade
    below the kernels' 2e-4 parity tolerance and far below bf16 serving
    noise; two VPU passes cheaper than the 5-term 7.1.26 used before. The
    interpret path keeps jax.nn.gelu so CPU goldens compare true erf.
    NOT the tanh approximation (a real framework-parity bug in round 2).
    """
    if jax.default_backend() != "tpu":
        return jax.nn.gelu(x, approximate=False)
    z = x * np.float32(2.0 ** -0.5)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + np.float32(0.47047) * az)
    poly = t * (np.float32(0.3480242)
                + t * (np.float32(-0.0958798)
                       + t * np.float32(0.7478556)))
    erf_az = 1.0 - poly * jnp.exp(-az * az)
    erf_z = jnp.sign(z) * erf_az
    return 0.5 * x * (1.0 + erf_z)


def _win_ln(x32, lns, lnb, dot_mode: str):
    """Per-pixel LayerNorm over the C sublane rows of a (C, lanes) window.

    Matches nn.layers.LayerNorm2d numerics (fp32 stats, eps 1e-5); on the
    bf16 serving path the normalized activations are re-quantized to bf16
    before the following MXU dot, mirroring the unfused path's dtype cast.
    """
    m = jnp.mean(x32, axis=0, keepdims=True)
    v = jnp.mean(jnp.square(x32 - m), axis=0, keepdims=True)
    y = (x32 - m) * jax.lax.rsqrt(v + 1e-5)
    y = y * lns[...] + lnb[...]
    if dot_mode == "interp_bf16":
        y = y.astype(jnp.bfloat16).astype(jnp.float32)
    return y


def _pick_rows(H: int, W: int, budget: int = 8192):
    """Rows per block: largest divisor of H with k <= 8, k*W <= budget AND
    a Mosaic-lowerable lane count (k*W divisible by 128 — the TPU lowering
    rejects other partial blocks). Small images (H*W <= budget) fall back
    to ONE block covering the whole image, which is always legal
    ("equal to the overall array dims"). Returns None when neither holds —
    callers must then take their unfused path.

    Swept on v5e at serving shapes: k=8 beats k=4 by 15% at C=40 448x640
    (32.2 vs 37.7 ms) and k=8 beats k=16 at C=80 224x320 (28.8 vs 31.2) —
    8 rows fill the sublane tile granularity; more rows add VMEM pressure
    without adding parallelism."""
    best = None
    for k in range(1, min(H, 8) + 1):
        if H % k == 0 and k * W <= budget and (k * W) % 128 == 0:
            best = k
    if best is None and H * W <= budget:
        return H
    return best


def fused_rows_ok(H: int, W: int) -> bool:
    """Whether the fused CF gdMlp/stem kernels can lower at this size."""
    return _pick_rows(H, W) is not None


def _fold_w1_taps(W1, dw, b1):
    """Fold the depthwise-3x3 taps (and b1) into the 1x1-in kernel.

    Returns (3, 2h, 3C+3): for each dx, a tap-scaled copy of W1 per dy
    (contraction rows ordered [dy=-1 | dy=0 | dy=+1]) plus three bias
    columns tap[dy,dx]*b1 that contract against row-validity rows, so the
    bias lands exactly where the old hid + b1*rowmask path put it."""
    h2, C = W1.shape
    taps = dw.astype(jnp.float32).reshape(h2, 3, 3)  # [o, dy, dx]
    if b1 is None:
        bcol = jnp.zeros((h2, 1), jnp.float32)
    else:
        bcol = b1.astype(jnp.float32)[:, None]
    Wb = jnp.concatenate([W1.astype(jnp.float32), bcol], axis=1)  # (2h, C+1)
    W1f = jnp.einsum("od,oyx->xoyd", Wb, taps)
    return W1f.reshape(3, h2, 3 * (C + 1))


def use_folded_conv(C: int) -> bool:
    """Whether the W1-folded dwconv beats the VPU tap loop at channel
    count C. MEASURED on v5e (round 4): at C=80 (K=3(C+1)=243) the folded
    form wins 25.5 -> 17.7 ms/L1-call (-31%); at C=40 (K=123) it LOSES
    29.1 -> 33.1 ms/L0-call — the contraction is too underfilled to beat
    the tap loop it replaces."""
    return C >= 64


def _dw3x3_taps(hid, dw, maskl, maskr, k: int, W: int):
    """Depthwise 3x3 over a (2h, (k+2)*W) hidden row-window (VPU form,
    used at narrow C where the W1-folded MXU form loses — see
    use_folded_conv).

    The dy taps for a fixed dx share one lane offset, so the nine input
    loads reduce to THREE lane-aligned row slices (dy offsets are multiples
    of W, a lane multiple at serving widths) reused across dx; the dx = ±1
    shift is applied ONCE per side to the accumulated t_dx instead of to
    six lane-rotated input loads. Values are bit-identical to the old
    nine-slice form: the positions whose shifted source crosses a row
    boundary (or the block edge) are exactly the maskl/maskr zeros.
    MEASURED dead ends (round 4): (a) hoisting the dx = ±1 taps into two
    pltpu.roll's of the whole window is 35% SLOWER (L0 serving 29 -> 39
    ms/call) — Mosaic lowers static circular rolls far worse than
    misaligned slices; (b) running the tap arithmetic in bf16 is 15% SLOWER
    (70.5 vs 61.4 ms/L0-call) — Mosaic's bf16 vector ops don't pack 2/lane
    here and the cast passes dominate. fp32 stands."""
    kW = k * W
    ts = []
    for dx in (-1, 0, 1):
        acc = None
        for dy in (-1, 0, 1):
            tap = dw[:, 3 * (dy + 1) + (dx + 1)][:, None]
            term = tap * hid[:, (1 + dy) * W : (1 + dy) * W + kW]
            acc = term if acc is None else acc + term
        ts.append(acc)
    tm, t0, tp = ts
    z = jnp.zeros((hid.shape[0], 128), jnp.float32)
    tm = jnp.concatenate([z, tm], axis=1)    # shift right: conv[p] = tm[p-1]
    tp = jnp.concatenate([tp, z], axis=1)    # shift left:  conv[p] = tp[p+1]
    return (t0
            + tm[:, 127 : 127 + kW] * maskl[...]
            + tp[:, 1 : 1 + kW] * maskr[...])


def _proj_dw_taps(x32m, rowmask, w1, b1, dw, maskl, maskr, k, W, dot_mode):
    """hid = W1 @ x (+ b1·rowmask) then the VPU tap loop."""
    if dot_mode == "tpu_bf16":
        hid = jnp.dot(w1[...], x32m.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    else:
        hid = jnp.dot(w1[...].astype(jnp.float32), x32m,
                      preferred_element_type=jnp.float32)
    if b1 is not None:
        hid = hid + b1[...] * rowmask
    return _dw3x3_taps(hid, dw, maskl, maskr, k, W)


def _conv3x3_dots(x32m, rowmask, w1f, maskl, maskr, k: int, W: int,
                  dot_mode: str, xw_scratch=None):
    """1x1-in proj + depthwise 3x3 as THREE MXU dots (W1-folded form).

    The tap form materializes hid = W1 @ x and runs a 9-tap VPU
    slice loop over the (2h, (k+2)W) hidden — ~20 VPU passes that
    dominated the fused-MLP kernel (traced round 4) while the MXU sat
    ~85% idle. Folding the taps into W1 (conv = Σ_dx maskdx ⊙
    (W1f[dx] @ xwin3_shifted_dx), xwin3 = the three dy-shifted windows
    stacked to 3C rows + 3 row-validity rows carrying b1) converts those
    passes into extra dot work on the idle MXU — a win only at C >= 64
    where the 3(C+1) contraction fills the MXU (see use_folded_conv)."""
    C = x32m.shape[0]
    kW = k * W
    z = jnp.zeros((C + 1, 128), jnp.float32)
    xpad = jnp.concatenate(
        [z, jnp.concatenate([x32m, rowmask], axis=0), z], axis=1)
    # stage the three dy-shifted windows through a VMEM scratch: stores
    # relayout their misaligned-slice values, while Mosaic's sublane concat
    # rejects pieces with mismatched lane/sublane offsets ("result/input
    # offset mismatch on non-concat dimension" — compile-time, W-dependent)
    for idx, dy in enumerate((-1, 0, 1)):
        s = 128 + (1 + dy) * W - 1
        xw_scratch[idx * (C + 1) : (idx + 1) * (C + 1), :] = (
            xpad[:, s : s + kW + 2])
    xwin3 = xw_scratch[...]  # (3(C+1), kW+2)
    if dot_mode == "tpu_bf16":
        xwin3 = xwin3.astype(jnp.bfloat16)
    conv = None
    for j, dx in enumerate((-1, 0, 1)):
        wj = w1f[j]
        if dot_mode != "tpu_bf16":
            wj = wj.astype(jnp.float32)
        # full-width dot on the aligned window; the dx shift is a lane
        # slice of the dot OUTPUT (the lowering class the old tap loop used)
        t = jnp.dot(wj, xwin3, preferred_element_type=jnp.float32)
        t = t[:, 1 + dx : 1 + dx + kW]
        if dx == -1:
            t = t * maskl[...]
        elif dx == 1:
            t = t * maskr[...]
        conv = t if conv is None else conv + t
    return conv


def _body(*refs, h: int, W: int, k: int, H: int, nblk: int, folded: bool,
          has_b1: bool, has_bdw: bool, has_b2: bool, dot_mode: str,
          has_ln: bool, residual: bool):
    it = iter(refs)
    xp_ref, xc_ref, xn_ref = next(it), next(it), next(it)
    lns = next(it) if has_ln else None
    lnb = next(it) if has_ln else None
    if folded:
        w1f = next(it)   # (3, 2h, 3(C+1)) tap-folded in-kernel (+b1 cols)
    else:
        w1 = next(it)
        b1 = next(it) if has_b1 else None
        dw = next(it)
    bdw = next(it) if has_bdw else None
    w2 = next(it)
    b2 = next(it) if has_b2 else None
    lrow = next(it)      # (1, (k+2)*W): lane -> row-in-block (0..k+1)
    maskl = next(it)     # (1, k*W): 0 where col == 0
    maskr = next(it)     # (1, k*W): 0 where col == W-1
    out_ref = next(it)
    xw_scratch = next(it) if folded else None

    i = pl.program_id(1)

    # assemble the (k+2)-row input window from the three row-blocks
    xin = jnp.concatenate(
        [xp_ref[0][:, (k - 1) * W:], xc_ref[0], xn_ref[0][:, :W]], axis=1)
    # rows outside [0, H) are conv zero-padding: the clamped neighbour
    # blocks hold garbage there, and the bias must not leak in either
    grow = lrow[...] + jnp.float32(i * k - 1)            # global row id
    rowmask = jnp.where(
        (grow >= 0.0) & (grow <= jnp.float32(H - 1)), 1.0, 0.0)
    x32 = xin.astype(jnp.float32)
    if has_ln:
        x32 = _win_ln(x32, lns, lnb, dot_mode)
    x32 = x32 * rowmask

    if folded:
        conv = _conv3x3_dots(x32, rowmask, w1f, maskl, maskr, k, W,
                             dot_mode, xw_scratch)
    else:
        conv = _proj_dw_taps(x32, rowmask, w1, b1, dw, maskl, maskr, k, W,
                             dot_mode)
    if has_bdw:
        conv = conv + bdw[...]

    g = _gelu_exact(conv[:h]) * conv[h:]
    if dot_mode == "tpu_bf16":
        out = jnp.dot(w2[...], g.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    elif dot_mode == "interp_bf16":
        out = jnp.dot(w2[...].astype(jnp.float32),
                      g.astype(jnp.bfloat16).astype(jnp.float32),
                      preferred_element_type=jnp.float32)
    else:
        out = jnp.dot(w2[...].astype(jnp.float32), g,
                      preferred_element_type=jnp.float32)
    if has_b2:
        out = out + b2[...]
    if residual:
        # out = x + gdmlp(LN(x)): the pre-norm center block doubles as the
        # residual stream (requires Cout == C)
        out = out + xc_ref[0].astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _gdmlp_ref(x, W1, b1, dw, bdw, W2, b2, H, Wd, lns=None, lnb=None,
               residual=False):
    """jnp composition oracle / backward path. x: (B, C, L) -> (B, Cout, L).
    Mirrors the kernel's numerics (fp32 math, bf16 MXU operand rounding on
    the bf16 path), including the optional fused pre-LN and residual add."""
    B, C, L = x.shape
    h2 = W1.shape[0]
    h = h2 // 2
    bf = x.dtype == jnp.bfloat16

    def mx(a):
        return a.astype(jnp.bfloat16).astype(jnp.float32) if bf else a.astype(jnp.float32)

    xi = x.astype(jnp.float32).reshape(B, C, H, Wd)
    if lns is not None:
        m = jnp.mean(xi, axis=1, keepdims=True)
        v = jnp.mean(jnp.square(xi - m), axis=1, keepdims=True)
        xi = (xi - m) * jax.lax.rsqrt(v + 1e-5)
        xi = (xi * lns.astype(jnp.float32)[None, :, None, None]
              + lnb.astype(jnp.float32)[None, :, None, None])
    hid = jnp.einsum("oc,bchw->bohw", mx(W1), mx(xi),
                     preferred_element_type=jnp.float32)
    if b1 is not None:
        hid = hid + b1.astype(jnp.float32)[None, :, None, None]
    hidp = jnp.pad(hid, ((0, 0), (0, 0), (1, 1), (1, 1)))
    conv = jnp.zeros_like(hid)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            tap = dw.astype(jnp.float32)[:, 3 * (dy + 1) + (dx + 1)]
            conv = conv + tap[None, :, None, None] * hidp[
                :, :, 1 + dy : 1 + dy + H, 1 + dx : 1 + dx + Wd]
    if bdw is not None:
        conv = conv + bdw.astype(jnp.float32)[None, :, None, None]
    g = _gelu_exact(conv[:, :h]) * conv[:, h:]
    out = jnp.einsum("oc,bchw->bohw", mx(W2), mx(g),
                     preferred_element_type=jnp.float32)
    if b2 is not None:
        out = out + b2.astype(jnp.float32)[None, :, None, None]
    out = out.reshape(B, -1, L)
    if residual:
        out = out + x.astype(jnp.float32)
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 11))
def gdmlp_fused_cf(x, W1, b1, dw, bdw, W2, b2, H: int, Wd: int,
                   lns=None, lnb=None, residual: bool = False):
    """Fused gdMlp. x: (B, C, H*Wd) channel-first.

    W1 (2h, C) 1x1-in kernel; dw (2h, 9) depthwise 3x3 taps (row-major
    dy, dx); W2 (Cout, h) 1x1-out kernel; b* optional biases. Returns
    (B, Cout, H*Wd) in x.dtype.

    lns/lnb (C,) fold the pre-MLP LayerNorm2d into the kernel (stats per
    pixel over the C sublane rows); residual=True adds the pre-norm x to
    the output (requires Cout == C) — together they run the whole
    ``x + gdmlp(LN(x))`` block branch in one pallas program.
    """
    B, C, L = x.shape
    assert L == H * Wd, (L, H, Wd)
    h2 = W1.shape[0]
    h = h2 // 2
    Cout = W2.shape[0]
    if residual:
        assert Cout == C, (Cout, C)

    k = _pick_rows(H, Wd)
    assert k is not None, (
        f"no Mosaic-lowerable row blocking for H={H}, W={Wd}; callers must "
        "check fused_rows_ok() and take the unfused path")
    nblk = H // k

    lrow = jnp.asarray(
        (np.arange((k + 2) * Wd) // Wd).astype(np.float32)).reshape(1, -1)
    col = np.arange(k * Wd) % Wd
    maskl = jnp.asarray((col != 0).astype(np.float32)).reshape(1, -1)
    maskr = jnp.asarray((col != Wd - 1).astype(np.float32)).reshape(1, -1)

    on_tpu = jax.default_backend() == "tpu"
    if x.dtype == jnp.bfloat16:
        dot_mode = "tpu_bf16" if on_tpu else "interp_bf16"
        wdt = jnp.bfloat16 if on_tpu else jnp.float32
    else:
        dot_mode = "f32"
        wdt = jnp.float32

    last = nblk - 1
    xspec_p = pl.BlockSpec((1, C, k * Wd),
                           lambda b, i: (b, 0, jnp.maximum(i - 1, 0)),
                           memory_space=pltpu.VMEM)
    xspec_c = pl.BlockSpec((1, C, k * Wd), lambda b, i: (b, 0, i),
                           memory_space=pltpu.VMEM)
    xspec_n = pl.BlockSpec((1, C, k * Wd),
                           lambda b, i: (b, 0, jnp.minimum(i + 1, last)),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, Cout, k * Wd), lambda b, i: (b, 0, i),
                            memory_space=pltpu.VMEM)
    const = lambda arr: pl.BlockSpec(
        arr.shape, lambda b, i: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    folded = use_folded_conv(C)
    w2 = W2.astype(wdt)
    operands = [x, x, x]
    in_specs = [xspec_p, xspec_c, xspec_n]
    if lns is not None:
        operands += [lns.astype(jnp.float32).reshape(C, 1),
                     lnb.astype(jnp.float32).reshape(C, 1)]
        in_specs += [const(operands[-2]), const(operands[-1])]
    if folded:
        w1f = _fold_w1_taps(W1, dw, b1).astype(wdt)
        operands.append(w1f)
        in_specs.append(const(w1f))
    else:
        w1 = W1.astype(wdt)
        operands.append(w1)
        in_specs.append(const(w1))
        if b1 is not None:
            b1f = b1.astype(jnp.float32).reshape(h2, 1)
            operands.append(b1f)
            in_specs.append(const(b1f))
        dwf = dw.astype(jnp.float32)
        operands.append(dwf)
        in_specs.append(const(dwf))
    if bdw is not None:
        bdwf = bdw.astype(jnp.float32).reshape(h2, 1)
        operands.append(bdwf)
        in_specs.append(const(bdwf))
    operands.append(w2)
    in_specs.append(const(w2))
    if b2 is not None:
        b2f = b2.astype(jnp.float32).reshape(Cout, 1)
        operands.append(b2f)
        in_specs.append(const(b2f))
    operands += [lrow, maskl, maskr]
    in_specs += [const(lrow), const(maskl), const(maskr)]

    kernel = functools.partial(
        _body, h=h, W=Wd, k=k, H=H, nblk=nblk, folded=folded,
        has_b1=b1 is not None, has_bdw=bdw is not None,
        has_b2=b2 is not None, dot_mode=dot_mode,
        has_ln=lns is not None, residual=residual)
    with mm_precision(x.dtype):
        return pl.pallas_call(
            kernel,
            grid=(B, nblk),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((B, Cout, L), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((3 * (C + 1), k * Wd + 2), jnp.float32)]
            if folded else [],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=not on_tpu,
        )(*operands)


def _stem_body(*refs, W: int, k: int, H: int, folded: bool, has_b1: bool,
               has_bdw: bool, dot_mode: str, has_ln: bool):
    it = iter(refs)
    xp_ref, xc_ref, xn_ref = next(it), next(it), next(it)
    lns = next(it) if has_ln else None
    lnb = next(it) if has_ln else None
    if folded:
        w1f = next(it)
    else:
        w1 = next(it)
        b1 = next(it) if has_b1 else None
        dw = next(it)
    bdw = next(it) if has_bdw else None
    lrow = next(it)
    maskl = next(it)
    maskr = next(it)
    out_ref = next(it)
    xw_scratch = next(it) if folded else None

    i = pl.program_id(1)
    xin = jnp.concatenate(
        [xp_ref[0][:, (k - 1) * W:], xc_ref[0], xn_ref[0][:, :W]], axis=1)
    grow = lrow[...] + jnp.float32(i * k - 1)
    rowmask = jnp.where(
        (grow >= 0.0) & (grow <= jnp.float32(H - 1)), 1.0, 0.0)
    x32 = xin.astype(jnp.float32)
    if has_ln:
        x32 = _win_ln(x32, lns, lnb, dot_mode)
    x32 = x32 * rowmask
    if folded:
        conv = _conv3x3_dots(x32, rowmask, w1f, maskl, maskr, k, W,
                             dot_mode, xw_scratch)
    else:
        conv = _proj_dw_taps(x32, rowmask, w1, b1, dw, maskl, maskr, k, W,
                             dot_mode)
    if has_bdw:
        conv = conv + bdw[...]
    out_ref[0] = (conv * jax.nn.sigmoid(conv)).astype(out_ref.dtype)


def _stem_ref(x, W1, b1, dw, bdw, H, Wd, lns=None, lnb=None):
    """jnp oracle: [LN ->] 1x1 proj -> dw3x3 -> silu, channel-first."""
    B, C, L = x.shape
    bf = x.dtype == jnp.bfloat16

    def mx(a):
        return a.astype(jnp.bfloat16).astype(jnp.float32) if bf else a.astype(jnp.float32)

    xi = x.astype(jnp.float32).reshape(B, C, H, Wd)
    if lns is not None:
        m = jnp.mean(xi, axis=1, keepdims=True)
        v = jnp.mean(jnp.square(xi - m), axis=1, keepdims=True)
        xi = (xi - m) * jax.lax.rsqrt(v + 1e-5)
        xi = (xi * lns.astype(jnp.float32)[None, :, None, None]
              + lnb.astype(jnp.float32)[None, :, None, None])
    hid = jnp.einsum("oc,bchw->bohw", mx(W1), mx(xi),
                     preferred_element_type=jnp.float32)
    if b1 is not None:
        hid = hid + b1.astype(jnp.float32)[None, :, None, None]
    hidp = jnp.pad(hid, ((0, 0), (0, 0), (1, 1), (1, 1)))
    conv = jnp.zeros_like(hid)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            tap = dw.astype(jnp.float32)[:, 3 * (dy + 1) + (dx + 1)]
            conv = conv + tap[None, :, None, None] * hidp[
                :, :, 1 + dy : 1 + dy + H, 1 + dx : 1 + dx + Wd]
    if bdw is not None:
        conv = conv + bdw.astype(jnp.float32)[None, :, None, None]
    out = conv * jax.nn.sigmoid(conv)
    return out.reshape(B, -1, L).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def stem_fused_cf(x, W1, b1, dw, bdw, H: int, Wd: int, lns=None, lnb=None):
    """Fused SS2D stem: in_proj 1x1 -> depthwise 3x3 -> SiLU, channel-first.

    Same kernel structure as :func:`gdmlp_fused_cf` without the gate/out
    projection (vmamba.py:658-661 in_proj + conv2d + act). x: (B, C, H*Wd);
    W1 (d_inner, C); dw (d_inner, 9). Returns (B, d_inner, H*Wd).
    """
    B, C, L = x.shape
    assert L == H * Wd, (L, H, Wd)
    Dh = W1.shape[0]

    k = _pick_rows(H, Wd)
    assert k is not None, (
        f"no Mosaic-lowerable row blocking for H={H}, W={Wd}; callers must "
        "check fused_rows_ok() and take the unfused path")
    nblk = H // k
    lrow = jnp.asarray(
        (np.arange((k + 2) * Wd) // Wd).astype(np.float32)).reshape(1, -1)
    col = np.arange(k * Wd) % Wd
    maskl = jnp.asarray((col != 0).astype(np.float32)).reshape(1, -1)
    maskr = jnp.asarray((col != Wd - 1).astype(np.float32)).reshape(1, -1)

    on_tpu = jax.default_backend() == "tpu"
    if x.dtype == jnp.bfloat16:
        dot_mode = "tpu_bf16" if on_tpu else "interp_bf16"
        wdt = jnp.bfloat16 if on_tpu else jnp.float32
    else:
        dot_mode = "f32"
        wdt = jnp.float32
    folded = use_folded_conv(C)
    if dot_mode == "interp_bf16":
        # interpret backend can't run bf16 dots; pre-round the weight and
        # dot in f32 (x is already bf16-precision)
        dot_mode = "f32"
        w1q = W1.astype(jnp.bfloat16).astype(jnp.float32)
    else:
        w1q = W1.astype(wdt)
    w1f = _fold_w1_taps(w1q, dw, b1).astype(w1q.dtype) if folded else None

    last = nblk - 1
    xspec_p = pl.BlockSpec((1, C, k * Wd),
                           lambda b, i: (b, 0, jnp.maximum(i - 1, 0)),
                           memory_space=pltpu.VMEM)
    xspec_c = pl.BlockSpec((1, C, k * Wd), lambda b, i: (b, 0, i),
                           memory_space=pltpu.VMEM)
    xspec_n = pl.BlockSpec((1, C, k * Wd),
                           lambda b, i: (b, 0, jnp.minimum(i + 1, last)),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, Dh, k * Wd), lambda b, i: (b, 0, i),
                            memory_space=pltpu.VMEM)
    const = lambda arr: pl.BlockSpec(
        arr.shape, lambda b, i: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    operands = [x, x, x]
    in_specs = [xspec_p, xspec_c, xspec_n]
    if lns is not None:
        operands += [lns.astype(jnp.float32).reshape(C, 1),
                     lnb.astype(jnp.float32).reshape(C, 1)]
        in_specs += [const(operands[-2]), const(operands[-1])]
    if folded:
        operands.append(w1f)
        in_specs.append(const(w1f))
    else:
        operands.append(w1q)
        in_specs.append(const(w1q))
        if b1 is not None:
            b1f = b1.astype(jnp.float32).reshape(Dh, 1)
            operands.append(b1f)
            in_specs.append(const(b1f))
        dwf = dw.astype(jnp.float32)
        operands.append(dwf)
        in_specs.append(const(dwf))
    if bdw is not None:
        bdwf = bdw.astype(jnp.float32).reshape(Dh, 1)
        operands.append(bdwf)
        in_specs.append(const(bdwf))
    operands += [lrow, maskl, maskr]
    in_specs += [const(lrow), const(maskl), const(maskr)]

    kernel = functools.partial(
        _stem_body, W=Wd, k=k, H=H, folded=folded,
        has_b1=b1 is not None, has_bdw=bdw is not None, dot_mode=dot_mode,
        has_ln=lns is not None)
    with mm_precision(x.dtype):
        return pl.pallas_call(
            kernel,
            grid=(B, nblk),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((B, Dh, L), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((3 * (C + 1), k * Wd + 2), jnp.float32)]
            if folded else [],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=not on_tpu,
        )(*operands)


def _stem_vjp_fwd(x, W1, b1, dw, bdw, H, Wd, lns, lnb):
    out = stem_fused_cf(x, W1, b1, dw, bdw, H, Wd, lns, lnb)
    return out, (x, W1, b1, dw, bdw, lns, lnb)


def _stem_vjp_bwd(H, Wd, res, g):
    x, W1, b1, dw, bdw, lns, lnb = res
    args = [x, W1, b1, dw, bdw, lns, lnb]
    diff_idx = [i for i, a in enumerate(args) if a is not None]

    def f(*present):
        full = list(args)
        for i, v in zip(diff_idx, present):
            full[i] = v
        return _stem_ref(full[0], full[1], full[2], full[3], full[4],
                         H, Wd, full[5], full[6])

    _, vjp = jax.vjp(f, *[args[i] for i in diff_idx])
    grads_present = vjp(g)
    out = [None] * len(args)
    for i, gv in zip(diff_idx, grads_present):
        out[i] = gv
    return tuple(out)


stem_fused_cf.defvjp(_stem_vjp_fwd, _stem_vjp_bwd)


def _vjp_fwd(x, W1, b1, dw, bdw, W2, b2, H, Wd, lns, lnb, residual):
    out = gdmlp_fused_cf(x, W1, b1, dw, bdw, W2, b2, H, Wd, lns, lnb,
                         residual)
    return out, (x, W1, b1, dw, bdw, W2, b2, lns, lnb)


def _vjp_bwd(H, Wd, residual, res, g):
    x, W1, b1, dw, bdw, W2, b2, lns, lnb = res
    args = [x, W1, b1, dw, bdw, W2, b2, lns, lnb]
    diff_idx = [i for i, a in enumerate(args) if a is not None]

    def f(*present):
        full = list(args)
        for i, v in zip(diff_idx, present):
            full[i] = v
        return _gdmlp_ref(full[0], full[1], full[2], full[3], full[4],
                          full[5], full[6], H, Wd, full[7], full[8],
                          residual)

    _, vjp = jax.vjp(f, *[args[i] for i in diff_idx])
    grads_present = vjp(g)
    out = [None] * len(args)
    for i, gv in zip(diff_idx, grads_present):
        out[i] = gv
    return tuple(out)


gdmlp_fused_cf.defvjp(_vjp_fwd, _vjp_bwd)
