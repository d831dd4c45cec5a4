"""Fused SS2D tail: direction-pair merge + out-LayerNorm + out_proj, CF.

Consumes the two sequence-pair scan outputs (row order and the
transposed-back col order, both (B/G, G*C, L) channel-first), and fuses
what the unfused path runs as 4 full-size XLA ops over lane-padded NHWC
arrays (merge add in fp32, LayerNorm2d, dtype cast, out_proj matmul —
vmamba.py:700-716 y_fwd path) into one pallas program over compact CF
blocks:

  y   = y_row + y_colT                      (fp32)
  yn  = LN_C(y) * scale + bias              (per-image C-chunk, eps 1e-5)
  out = W_out^T @ yn.astype(bf16)           (block-diagonal grouped MXU dot)

The per-image LayerNorm statistics run on the MXU: a (G, G*C) averaging
matrix contracts each image's C-chunk of sublanes per lane, and a
(G*C, G) broadcast matrix expands the (G, L) statistics back — no
sublane-segment reductions on the VPU.

An optional residual operand (the block's pre-norm stream, same grouped
layout as the output) is added in-kernel, running the whole
``x + SS2D(LN(x))`` branch tail without a separate XLA add pass.
Backward: custom_vjp through the jnp composition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ss2d_fused import mm_precision

_EPS = 1e-5
_LBLK = 2048


def _tail_body(refs, has_bias: bool, bf16_dot: bool, has_res: bool,
               merged: bool):
    refs = list(refs)
    if merged:
        yr_ref = refs[0]
        yc_ref = None
        i = 1
    else:
        yr_ref, yc_ref = refs[:2]
        i = 2
    msum, bcast, sc_ref, bi_ref, w_ref = refs[i : i + 5]
    i += 5
    bo_ref = refs[i] if has_bias else None
    i += int(has_bias)
    res_ref = refs[i] if has_res else None
    i += int(has_res)
    out_ref = refs[i]

    # LN statistics need f32-grade operand precision: Mosaic lowers f32 MXU
    # dots as single-pass bf16 by default, and scan outputs are
    # mean-dominated (|m| >> std), so bf16-truncated stats cost ~0.2
    # absolute LN error on the real chip (invisible in interpret mode).
    # Mosaic supports only DEFAULT (1 bf16 pass) and HIGHEST (6 passes;
    # Precision.HIGH raises NotImplementedError in the kernel lowering), so
    # f32-grade stats at DEFAULT cost come from a bf16x2 operand split:
    # dot(M, hi) + dot(M, lo) with hi = bf16(x), lo = bf16(x - hi) carries
    # ~16 operand mantissa bits (rel 1.5e-5) in 2 passes — the matrices
    # themselves are EXACT in bf16 (ones / {0,1}; the 1/C mean scale is
    # applied on the small (G, L) result in f32). BEM_TAIL_STAT_PREC=
    # highest restores the 6-pass form for A/B (tools/tail_prec_check.py).
    import os

    use_highest = os.environ.get("BEM_TAIL_STAT_PREC", "split2") == "highest"
    hi = jax.lax.Precision.HIGHEST

    def dot2(M, t):
        Mf = M[...].astype(jnp.float32)
        if use_highest:
            return jnp.dot(Mf, t, preferred_element_type=jnp.float32,
                           precision=hi)
        # operands stay f32 arrays (Mosaic rejects bf16 lhs here: "Bad lhs
        # type") but are pre-rounded to bf16 VALUES, so DEFAULT's in-pass
        # bf16 truncation is exact on them
        th = t.astype(jnp.bfloat16).astype(jnp.float32)
        tl = (t - th).astype(jnp.bfloat16).astype(jnp.float32)
        lo = jax.lax.Precision.DEFAULT
        return (jnp.dot(Mf, th, preferred_element_type=jnp.float32,
                        precision=lo)
                + jnp.dot(Mf, tl, preferred_element_type=jnp.float32,
                          precision=lo))

    y = yr_ref[0].astype(jnp.float32)
    if not merged:
        y = y + yc_ref[0].astype(jnp.float32)
    inv_c = np.float32(1.0) / np.float32(y.shape[0] // msum.shape[0])
    m = dot2(msum, y) * inv_c                                        # (G, L)
    mf = dot2(bcast, m)                                              # (GC, L)
    # centered two-pass variance: the E[y^2]-E[y]^2 form cancels
    # catastrophically when the per-pixel mean dominates the spread,
    # costing a further ~1e-2 absolute LN error
    yc = y - mf
    var = dot2(msum, yc * yc) * inv_c
    invf = dot2(bcast, jax.lax.rsqrt(var + _EPS))
    yn = yc * invf * sc_ref[...] + bi_ref[...]
    # the unfused path casts LN output to the compute dtype before the
    # out_proj matmul; mirror that (bf16 MXU operands on the bf16 serving
    # path, f32 otherwise). The CPU interpret backend cannot run bf16 dots,
    # so it upcasts the bf16-rounded values — identical numerics.
    w = w_ref[...]
    if bf16_dot == "tpu_bf16":
        yn = yn.astype(jnp.bfloat16)
    elif bf16_dot == "interp_bf16":
        yn = yn.astype(jnp.bfloat16).astype(jnp.float32)
        w = w.astype(jnp.float32)
    else:  # f32
        w = w.astype(jnp.float32)
    out = jnp.dot(w, yn, preferred_element_type=jnp.float32)
    if has_bias:
        out = out + bo_ref[...]
    if has_res:
        out = out + res_ref[0].astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _tail_ref(y_row, y_colT, scale, bias, Wout, bout, G, res=None):
    """jnp composition (oracle / backward / non-TPU path).
    y_colT=None means y_row already carries the merged directions."""
    Bg, GC, L = y_row.shape
    C = GC // G
    y = y_row.astype(jnp.float32)
    if y_colT is not None:
        y = y + y_colT.astype(jnp.float32)
    y = y.reshape(Bg, G, C, L)
    m = jnp.mean(y, axis=2, keepdims=True)
    v = jnp.mean(jnp.square(y - m), axis=2, keepdims=True)
    yn = (y - m) * jax.lax.rsqrt(v + _EPS)
    yn = yn * scale.astype(jnp.float32)[None, None, :, None]
    yn = yn + bias.astype(jnp.float32)[None, None, :, None]
    # cast to the compute dtype before the matmul, like the unfused Dense
    # (bf16-round + f32 upcast on the bf16 path — executable everywhere)
    if y_row.dtype == jnp.bfloat16:
        yn = yn.astype(jnp.bfloat16).astype(jnp.float32)
        w = Wout.astype(jnp.bfloat16).astype(jnp.float32)
    else:
        w = Wout.astype(jnp.float32)
    out = jnp.einsum("bgcl,cd->bgdl", yn, w,
                     preferred_element_type=jnp.float32)
    if bout is not None:
        out = out + bout.astype(jnp.float32)[None, None, :, None]
    out = out.reshape(Bg, G * Wout.shape[1], L)
    if res is not None:
        out = out + res.astype(jnp.float32)
    return out.astype(y_row.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def ss2d_tail_cf(y_row, y_colT, scale, bias, Wout, bout, G: int, res=None):
    """Fused merge + LN + out_proj [+ residual]. y_row/y_colT: (B/G, G*C, L).
    Pass y_colT=None when y_row already carries the merged directions (the
    col pair's ``y0`` merge) — the tail then reads ONE stream.

    scale/bias: (C,) LayerNorm2d params; Wout: (C, C_out) Dense kernel;
    bout: (C_out,) or None; res: optional (B/G, G*C_out, L) residual
    stream added to the output. Returns (B/G, G*C_out, L) in y_row.dtype.
    """
    Bg, GC, L = y_row.shape
    C = GC // G
    Cout = Wout.shape[1]
    has_bias = bout is not None
    merged = y_colT is None

    lblk = min(_LBLK, -(-L // 128) * 128)
    Lp = -(-L // lblk) * lblk
    if Lp != L:
        y_row = jnp.pad(y_row, ((0, 0), (0, 0), (0, Lp - L)))
        if not merged:
            y_colT = jnp.pad(y_colT, ((0, 0), (0, 0), (0, Lp - L)))
    nL = Lp // lblk

    # LN statistics / broadcast matrices and block-diagonal projection.
    # msum holds EXACT 1.0 entries (bf16-representable for the stat dots'
    # bf16x2 split); the 1/C mean scale is applied in-kernel on the small
    # (G, L) results in f32.
    msum = np.zeros((G, GC), np.float32)
    bcast = np.zeros((GC, G), np.float32)
    for g in range(G):
        msum[g, g * C : (g + 1) * C] = 1.0
        bcast[g * C : (g + 1) * C, g] = 1.0
    msum = jnp.asarray(msum)
    bcast = jnp.asarray(bcast)
    w_dtype = jnp.bfloat16 if y_row.dtype == jnp.bfloat16 else jnp.float32
    eye = jnp.eye(G, dtype=w_dtype)
    w_bd = jnp.kron(eye, Wout.T.astype(w_dtype))  # (G*Cout, G*C)
    sc = jnp.tile(scale.astype(jnp.float32), G).reshape(GC, 1)
    bi = jnp.tile(bias.astype(jnp.float32), G).reshape(GC, 1)

    y_spec = pl.BlockSpec((1, GC, lblk), lambda b, l: (b, 0, l),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, G * Cout, lblk), lambda b, l: (b, 0, l),
                            memory_space=pltpu.VMEM)
    const = lambda arr: pl.BlockSpec(
        arr.shape, lambda b, l: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    if merged:
        operands = [y_row, msum, bcast, sc, bi, w_bd]
        in_specs = [y_spec, const(msum), const(bcast), const(sc),
                    const(bi), const(w_bd)]
    else:
        operands = [y_row, y_colT, msum, bcast, sc, bi, w_bd]
        in_specs = [y_spec, y_spec, const(msum), const(bcast), const(sc),
                    const(bi), const(w_bd)]
    if has_bias:
        bo = jnp.tile(bout.astype(jnp.float32), G).reshape(G * Cout, 1)
        operands.append(bo)
        in_specs.append(const(bo))
    if res is not None:
        if Lp != L:
            res = jnp.pad(res, ((0, 0), (0, 0), (0, Lp - L)))
        operands.append(res)
        in_specs.append(out_spec)

    on_tpu = jax.default_backend() == "tpu"
    if y_row.dtype == jnp.bfloat16:
        dot_mode = "tpu_bf16" if on_tpu else "interp_bf16"
    else:
        dot_mode = "f32"
    kernel = functools.partial(
        lambda *refs, has_bias, bf16_dot, has_res, merged: _tail_body(
            refs, has_bias, bf16_dot, has_res, merged),
        has_bias=has_bias, bf16_dot=dot_mode, has_res=res is not None,
        merged=merged)
    with mm_precision(y_row.dtype):
        out = pl.pallas_call(
            kernel,
            grid=(Bg, nL),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((Bg, G * Cout, Lp), y_row.dtype),
            # the optional residual block pushes the live set past the 16M
            # scoped-vmem default at GC=320/LBLK=2048; v5e has headroom
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=jax.default_backend() != "tpu",
        )(*operands)
    return out[..., :L]


def _vjp_fwd(y_row, y_colT, scale, bias, Wout, bout, G, res):
    out = ss2d_tail_cf(y_row, y_colT, scale, bias, Wout, bout, G, res)
    return out, (y_row, y_colT, scale, bias, Wout, bout, res)


def _vjp_bwd(G, saved, g):
    y_row, y_colT, scale, bias, Wout, bout, res = saved
    args = [y_row, y_colT, scale, bias, Wout, bout, res]
    diff_idx = [i for i, a in enumerate(args) if a is not None]

    def f(*present):
        full = list(args)
        for i, v in zip(diff_idx, present):
            full[i] = v
        return _tail_ref(full[0], full[1], full[2], full[3], full[4],
                         full[5], G, full[6])

    _, vjp = jax.vjp(f, *[args[i] for i in diff_idx])
    grads_present = vjp(g)
    out = [None] * len(args)
    for i, gv in zip(diff_idx, grads_present):
        out[i] = gv
    return tuple(out)


ss2d_tail_cf.defvjp(_vjp_fwd, _vjp_bwd)
