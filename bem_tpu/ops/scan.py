"""First-order linear recurrence (selective scan) — the hot op of SS2D.

TPU-native replacement for the reference CUDA kernel
``selective_scan_cuda_oflex`` (reference: kernels/selective_scan/csrc/...,
math spec in kernels/selective_scan/README.md:10-91 and the pure-torch oracle
``selective_scan_torch`` at basicsr/vmamba/models/csms6s.py:29-72).

Design
------
The only stateful primitive is ``linear_scan(a, b) -> h`` computing the
inclusive scan of ``h_t = a_t * h_{t-1} + b_t`` along the sequence axis.
Everything else in the selective scan (discretization ``exp(Δ·A)``, the input
projection ``Δ·B·u``, the readout ``C·h + D·u``) is pure elementwise/matmul
jnp that XLA fuses around the scan.

``linear_scan`` has three interchangeable backends:

- ``"ref"``    — ``jax.lax.scan`` sequential oracle (slow, bitwise-simple).
- ``"xla"``    — ``jax.lax.associative_scan`` (parallel prefix in pure XLA).
- ``"pallas"`` — blockwise Pallas TPU kernel: the sequence is tiled into
  VMEM blocks; inside a block an O(log Lblk) doubling scan runs on the VPU,
  and a carried prefix state in VMEM scratch links blocks (the same chunked
  formulation as the CUDA kernel's ``smem_running_prefix``,
  selective_scan_fwd_kernel_oflex.cuh:86).

The custom VJP expresses the backward pass through the *same* primitive run
in reverse: with ``λ_t = g_t + a_{t+1} λ_{t+1}`` (a flipped linear scan),
``∂b = λ`` and ``∂a_t = λ_t h_{t-1}`` — mirroring the reference's reverse
scan kernel (selective_scan_bwd_kernel_oflex.cuh).

Layout: channels-last ``(..., L, D)`` so D rides the 128-wide lane dimension
and L the sublanes. Scan math is always fp32 (matching the CUDA kernel's
float accumulators), inputs may be bf16.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ----------------------------------------------------------------------------
# Backend selection
# ----------------------------------------------------------------------------

_DEFAULT_BACKEND = None


def default_backend() -> str:
    global _DEFAULT_BACKEND
    if _DEFAULT_BACKEND is None:
        plat = jax.default_backend()
        _DEFAULT_BACKEND = "pallas" if plat == "tpu" else "xla"
    return _DEFAULT_BACKEND


def set_default_backend(name: Optional[str]) -> None:
    """Override the global scan backend ("ref" | "xla" | "pallas" | None=auto)."""
    global _DEFAULT_BACKEND
    assert name in (None, "ref", "xla", "pallas")
    _DEFAULT_BACKEND = name


# ----------------------------------------------------------------------------
# Reference + XLA backends
# ----------------------------------------------------------------------------


def _linear_scan_ref(a: jax.Array, b: jax.Array) -> jax.Array:
    """Sequential oracle via lax.scan. a, b: (..., L, D)."""

    def step(h, ab):
        a_t, b_t = ab
        h = a_t * h + b_t
        return h, h

    L = a.shape[-2]
    init = jnp.zeros(a.shape[:-2] + a.shape[-1:], a.dtype)
    # move L to the leading axis for lax.scan
    a_l = jnp.moveaxis(a, -2, 0)
    b_l = jnp.moveaxis(b, -2, 0)
    _, h = jax.lax.scan(step, init, (a_l, b_l))
    return jnp.moveaxis(h, 0, -2)


def _combine(left, right):
    a1, b1 = left
    a2, b2 = right
    return a1 * a2, a2 * b1 + b2


def _linear_scan_xla(a: jax.Array, b: jax.Array) -> jax.Array:
    _, h = jax.lax.associative_scan(_combine, (a, b), axis=-2)
    return h


# ----------------------------------------------------------------------------
# Pallas TPU backend
# ----------------------------------------------------------------------------

_LBLK = 256  # sequence rows per block (sublane axis), power of two
_DBLK = 128  # channels per block (lane axis)


def _shifted(x: jax.Array, s: int, fill: float, reverse: bool) -> jax.Array:
    """x shifted by s rows along axis 0 (down, or up when reverse); the
    vacated s rows become `fill`."""
    n = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    if reverse:
        rolled = pltpu.roll(x, (n - s) % n, axis=0)
        return jnp.where(row >= n - s, jnp.full_like(x, fill), rolled)
    rolled = pltpu.roll(x, s, axis=0)
    return jnp.where(row < s, jnp.full_like(x, fill), rolled)


def _scan_block(a, b, reverse: bool):
    """Inclusive doubling scan of the (a, b) monoid over axis 0 of a block
    (top-down, or bottom-up when reverse)."""
    n = a.shape[0]
    s = 1
    while s < n:
        a_sh = _shifted(a, s, 1.0, reverse)
        b_sh = _shifted(b, s, 0.0, reverse)
        b = a * b_sh + b
        a = a * a_sh
        s *= 2
    return a, b


def _scan_kernel(a_ref, b_ref, h_ref, carry_ref, *, reverse: bool):
    li = pl.program_id(2)

    @pl.when(li == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    a = a_ref[0]
    b = b_ref[0]
    a_pref, b_pref = _scan_block(a, b, reverse)
    # fold in the state carried from the already-scanned blocks of this
    # (m, d) slice (earlier blocks, or later ones in the reverse walk)
    h = a_pref * carry_ref[0:1, :] + b_pref
    h_ref[0] = h
    carry_ref[0:1, :] = h[0:1, :] if reverse else h[-1:, :]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("reverse",))
def _linear_scan_pallas(a: jax.Array, b: jax.Array,
                        reverse: bool = False) -> jax.Array:
    """reverse=True computes h_t = a_t * h_{t+1} + b_t natively: the grid
    walks L-blocks last-to-first and the in-block doubling runs bottom-up —
    no jnp.flip round-trips (the backward pass' three full-array flips cost
    ~50 ms/train-iter before this, measured)."""
    orig_shape = a.shape
    L, D = a.shape[-2], a.shape[-1]
    a2 = a.reshape(-1, L, D)
    b2 = b.reshape(-1, L, D)
    M = a2.shape[0]

    Lp = _round_up(L, _LBLK)
    # narrow channel counts keep D as the (partial) lane dim instead of
    # zero-padding to the 128 lane tile: Mosaic allows a block lane dim equal
    # to the full array dim, and the explicit pads cost 3.2x HBM traffic at
    # the ss2d backward's D=40 (27 ms/train-iter of pad ops alone, measured)
    dblk = D if D <= _DBLK else _DBLK
    Dp = _round_up(D, dblk)
    if Lp != L:
        # identity padding (a=1, b=0) keeps the carry exact through the tail
        # (in reverse, the pad region is walked first and leaves the carry 0)
        a2 = jnp.concatenate([a2, jnp.ones((M, Lp - L, D), a2.dtype)], axis=1)
        b2 = jnp.concatenate([b2, jnp.zeros((M, Lp - L, D), b2.dtype)], axis=1)
    if Dp != D:
        a2 = jnp.pad(a2, ((0, 0), (0, 0), (0, Dp - D)))
        b2 = jnp.pad(b2, ((0, 0), (0, 0), (0, Dp - D)))

    nL = Lp // _LBLK
    last = nL - 1
    grid = (M, Dp // dblk, nL)
    if reverse:
        index_map = lambda m, d, l: (m, last - l, d)
    else:
        index_map = lambda m, d, l: (m, l, d)
    spec = pl.BlockSpec((1, _LBLK, dblk), index_map, memory_space=pltpu.VMEM)
    h = pl.pallas_call(
        functools.partial(_scan_kernel, reverse=reverse),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((M, Lp, Dp), a2.dtype),
        scratch_shapes=[pltpu.VMEM((8, dblk), a2.dtype)],
        # off-TPU (CPU tests) the Mosaic kernel runs in interpreter mode
        interpret=jax.default_backend() != "tpu",
    )(a2, b2)
    return h[:, :L, :D].reshape(orig_shape)


# ----------------------------------------------------------------------------
# Public linear_scan with custom VJP
# ----------------------------------------------------------------------------


def _dispatch(a, b, backend, reverse=False):
    if backend == "pallas":
        return _linear_scan_pallas(a, b, reverse)
    if reverse:  # ref/xla backends reverse by flipping around a forward scan
        return jnp.flip(
            _dispatch(jnp.flip(a, axis=-2), jnp.flip(b, axis=-2), backend),
            axis=-2)
    if backend == "ref":
        return _linear_scan_ref(a, b)
    if backend == "xla":
        return _linear_scan_xla(a, b)
    raise ValueError(f"unknown scan backend: {backend}")


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _linear_scan(a, b, backend, reverse):
    return _dispatch(a, b, backend, reverse)


def _linear_scan_fwd(a, b, backend, reverse):
    h = _dispatch(a, b, backend, reverse)
    return h, (a, h)


def _linear_scan_bwd(backend, reverse, res, g):
    a, h = res
    ones = jnp.ones_like(a[..., :1, :])
    zeros = jnp.zeros_like(h[..., :1, :])
    if reverse:
        # h_t = a_t h_{t+1} + b_t  =>  λ_t = g_t + a_{t-1} λ_{t-1} (forward
        # scan over the shifted-down a), ∂a_t = λ_t h_{t+1}
        a_adj = jnp.concatenate([ones, a[..., :-1, :]], axis=-2)
        h_adj = jnp.concatenate([h[..., 1:, :], zeros], axis=-2)
    else:
        # λ_t = g_t + a_{t+1} λ_{t+1}  — reverse-direction scan
        a_adj = jnp.concatenate([a[..., 1:, :], ones], axis=-2)
        h_adj = jnp.concatenate([zeros, h[..., :-1, :]], axis=-2)
    lam = _dispatch(a_adj, g, backend, reverse=not reverse)
    da = lam * h_adj
    db = lam
    return da, db


_linear_scan.defvjp(_linear_scan_fwd, _linear_scan_bwd)


def linear_scan(a: jax.Array, b: jax.Array, backend: Optional[str] = None,
                reverse: bool = False) -> jax.Array:
    """Inclusive scan of ``h_t = a_t * h_{t-1} + b_t`` along axis -2
    (or ``h_t = a_t * h_{t+1} + b_t`` when reverse=True — natively walked
    back-to-front, no flips).

    a, b: (..., L, D). Returns h with the same shape/dtype. Differentiable.
    """
    if backend is None:
        backend = default_backend()
    return _linear_scan(a, b, backend, reverse)


# ----------------------------------------------------------------------------
# Selective scan (the SS2D recurrence), channels-last
# ----------------------------------------------------------------------------


def selective_scan(
    u: jax.Array,  # (B, L, KD)
    delta: jax.Array,  # (B, L, KD)
    A: jax.Array,  # (KD, N)
    B: jax.Array,  # (B, L, K, N)
    C: jax.Array,  # (B, L, K, N)
    D: Optional[jax.Array] = None,  # (KD,)
    delta_bias: Optional[jax.Array] = None,  # (KD,)
    delta_softplus: bool = True,
    backend: Optional[str] = None,
) -> jax.Array:
    """Selective scan: ``h_t = exp(Δ_t A) h_{t-1} + Δ_t B_t u_t; y_t = C_t·h_t + D u_t``.

    Channels-last layout of the reference op (basicsr/vmamba/models/csms6s.py:29-72,
    which is (B, KD, L)): here sequences run along axis 1 and channels ride the
    TPU lane dimension. K is the direction-group count (B/C are shared across
    the KD/K channels of each group). Scan math is fp32; output is fp32
    (the reference "oflex" mode: fp16/bf16 in, fp32 out, csms6s.py:53-72).
    """
    Bt, L, KD = u.shape
    _, _, K, N = B.shape
    Cdim = KD // K

    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    A = A.astype(jnp.float32)
    B = B.astype(jnp.float32)
    C = C.astype(jnp.float32)

    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)[None, None, :]
    if delta_softplus:
        delta = jax.nn.softplus(delta)

    # discretize: a = exp(Δ ⊙ A), b = Δ ⊙ B ⊙ u   (all (B, L, KD, N))
    a = jnp.exp(delta[..., None] * A[None, None])
    Bex = jnp.repeat(B, Cdim, axis=2)  # (B, L, KD, N) group-expanded
    b = (delta * u)[..., None] * Bex

    h = linear_scan(
        a.reshape(Bt, L, KD * N), b.reshape(Bt, L, KD * N), backend=backend
    ).reshape(Bt, L, KD, N)

    Cex = jnp.repeat(C, Cdim, axis=2)
    y = jnp.sum(h * Cex, axis=-1)  # (B, L, KD)
    if D is not None:
        y = y + u * D.astype(jnp.float32)[None, None, :]
    return y
