"""SS2D — 2D selective scan block, the VMamba core op.

TPU-native rebuild of the reference SS2Dv2 with ``forward_type="v05_noz"``
(the variant every BEM arch uses, UNet_arch.py:219): __init__ parity with
vmamba.py:437-545, forward parity with forwardv2 (vmamba.py:700-716) and
forward_corev2 (vmamba.py:547-698).

Differences by design (not translation):
- channels-last NHWC; ``Linear2d``-as-1x1-conv becomes a plain Dense on the
  lane axis; LayerNorm2d needs no permutes.
- the K=4 directional projections run as one batched einsum on the MXU
  (replacing grouped conv1d / Triton cross-scan);
- the scan itself is :func:`bem_tpu.ops.scan.selective_scan` (Pallas kernel
  on TPU) with fp32 carry regardless of compute dtype;
- Bayesian conversion is the ``bayesian`` flag: it turns in_proj / conv2d /
  out_proj into reparameterized layers — exactly the module set the
  reference's convert2bnn swaps inside an SS2D (raw parameters
  x_proj_weight/dt_projs/A_logs/Ds are not modules and stay deterministic,
  tools.py:53-63).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.cross_scan import (
    cross_scan,
    cross_merge,
    cross_scan_cf,
    cross_merge_cf,
    cross_scan_cf_input,
    cross_merge_cf_output,
)
from ..ops.scan import selective_scan, default_backend
from ..ops.scan_fused import selective_scan_fused
from ..ops.ss2d_fused import ss2d_dir_fused
from . import init as inits
from .layers import (Conv2d, Dense, DenseParams, LayerNorm2d,
                     LayerNormParams, Identity)


def _gelu_exact(x):
    # torch nn.GELU default is the exact erf form; jax.nn.gelu
    # defaults to the tanh approximation (a ~1e-3 systematic
    # parity error that compounds over deep stacks)
    import jax
    return jax.nn.gelu(x, approximate=False)


def parse_forward_type(forward_type: str):
    """Split a reference forward_type string into (base, flags dict)."""
    flags = {
        "no32": False,
        "oact": False,
        "noz": False,
        "nozact": False,
        "out_norm": "ln",
    }
    out_norm_tags = (
        ("_onnone", "none"),
        ("_ondwconv3", "dwconv3"),
        ("_oncnorm", "cnorm"),
        ("_onsoftmax", "softmax"),
        ("_onsigmoid", "sigmoid"),
    )
    # strip trailing tags in any order until fixpoint
    changed = True
    while changed:
        changed = False
        for tag in ("_no32", "_oact", "_nozact", "_noz"):
            if forward_type.endswith(tag):
                flags[tag[1:]] = True
                forward_type = forward_type[: -len(tag)]
                changed = True
        for tag, name in out_norm_tags:
            if forward_type.endswith(tag):
                flags["out_norm"] = name
                forward_type = forward_type[: -len(tag)]
                changed = True
    return forward_type, flags


_SCAN_MODES = {
    "v01": 0, "v02": 0, "v03": 0, "v04": 0, "v05": 0, "v2": 0,
    "v051d": 1, "v052d": 2, "v052dc": 3,
    # v0 (mamba-backend SS2D, vmamba.py:293-436): same cross2d math with
    # forced fp32 and a always-gated z branch
    "v0": 0, "v0seq": 0,
}
_FORCE_FP32 = {"v01": True, "v02": True, "v03": True, "v2": True,
               "v0": True, "v0seq": True}


def _plain_ln(x, ln, axis):
    """LayerNorm2d math on raw (scale, bias) params (fp32, eps 1e-5)."""
    scale, bias = ln
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=axis, keepdims=True)
    v = jnp.mean(jnp.square(xf - m), axis=axis, keepdims=True)
    y = (xf - m) * jax.lax.rsqrt(v + 1e-5)
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]
    y = y * scale.reshape(shape) + bias.reshape(shape)
    return y.astype(x.dtype)


class SS2D(nn.Module):
    """See module docstring. ``forward_type`` selects the variant:
    v0/v0seq (mamba-backend path, vmamba.py:293-436), v01-v05/v2 (+1d/2d/2dc
    and flag postfixes, SS2Dv2, vmamba.py:437-766), m0 (mamba2/SSD,
    SS2Dm0, vmamba.py:967-1157). v3/xv (SS2Dv3, vmamba.py:769-965) is
    implemented for the xv1a/xv2a/xv3a modes."""

    d_model: int = 96
    d_state: int = 1
    ssm_ratio: float = 1.0
    dt_rank: Any = "auto"
    d_conv: int = 3
    conv_bias: bool = False
    dropout: float = 0.0
    bias: bool = False
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init: str = "random"
    dt_scale: float = 1.0
    dt_init_floor: float = 1e-4
    initialize: str = "v0"
    forward_type: str = "v05_noz"
    bayesian: bool = False
    sigma_init: float = 0.05
    scan_backend: Optional[str] = None
    dtype: Optional[Any] = None
    layout: str = "NHWC"  # 'NCHW' = channel-first (W-minor), same params
    # m0 (mamba2) extras (SS2Dm0.__initm0__, vmamba.py:967-1070)
    chunk_size: int = 64
    with_initial_state: bool = False
    # activation between conv and scan / on z (reference SS2D dispatcher
    # default act_layer=nn.SiLU, vmamba.py:1167; only the m0 path reads this
    # — v0/v2 always use silu like the reference classes built via VSSBlock)
    act_layer: str = "silu"

    @nn.compact
    def __call__(self, x: jax.Array, hw: Optional[tuple] = None,
                 ln=None, residual: bool = False) -> jax.Array:
        """x: (B, H, W, d_model) or (B, d_model, H, W) -> same layout.

        layout='NCHW' additionally accepts the flattened form (B, d_model,
        H*W) with ``hw=(H, W)`` and returns it flattened: TPU physical
        layouts tile the two minor dims, so a (C, L)-flat stream lets the
        grouped kernel reshapes be free bitcasts while (B, C, H, W) would
        re-tile to (H, W) between every op (measured ~110 ms/iter of pure
        relayout in the serving pipeline).

        ln=(scale, bias) applies the block's pre-norm inside this module
        (fused into the stem kernel on the serving path) and residual=True
        adds the pre-norm input to the output (fused into the tail kernel),
        so VSSBlock's ``x + SS2D(LN(x))`` branch runs without separate XLA
        LN/add passes. Non-fused paths apply them as plain ops — the math
        is identical either way.
        """
        base, flags = parse_forward_type(self.forward_type)
        flat = x.ndim == 3
        if flat and hw is None:
            raise ValueError("3-D (flat CF) input requires hw=(H, W)")
        x_res = x if residual else None
        if base.startswith("m"):
            if flat:
                x = x.reshape(x.shape[0], x.shape[1], *hw)
            if ln is not None:
                x = _plain_ln(x, ln, 1 if self.layout == "NCHW" else -1)
            out = self._forward_m0(x, base, flags)
            if residual:
                out = out + (x_res.reshape(out.shape) if flat else x_res)
            if flat:
                out = out.reshape(out.shape[0], out.shape[1], -1)
            return out
        if base not in _SCAN_MODES:
            raise NotImplementedError(f"forward_type base {base!r}")
        scans = _SCAN_MODES[base]
        force_fp32 = _FORCE_FP32.get(base, False)
        cf = self.layout == "NCHW"
        ch_axis = 1 if cf else -1

        d_inner = int(self.ssm_ratio * self.d_model)
        R = math.ceil(self.d_model / 16) if self.dt_rank == "auto" else self.dt_rank
        N = self.d_state
        K = 4
        disable_z = flags["noz"]
        bayes = dict(bayesian=self.bayesian, sigma_init=self.sigma_init)

        if flat:
            if not cf:
                raise ValueError("flat input requires layout='NCHW'")
            B_ = x.shape[0]
            H, W = hw
        elif cf:
            B_, _, H, W = x.shape
        else:
            B_, H, W, _ = x.shape
        L = H * W

        # the fully-fused CF serving path (split-direction scan kernels +
        # fused tail) also fuses the stem: in_proj + dwconv + silu run as one
        # pallas program (ops/gdmlp_fused.py stem_fused_cf)
        backend = self.scan_backend or default_backend()
        # the fused serving core (split-direction scan kernels + fused
        # merge+LN+out_proj tail) applies to BOTH layouts: in NHWC the core
        # still runs channel-first internally (two roofline boundary
        # transposes), because at narrow C the CF kernels beat the
        # lane-padded NHWC composition
        import os
        fused_core = (backend == "pallas" and scans == 0
                      and flags["out_norm"] == "ln" and disable_z
                      and not flags["oact"]
                      and os.environ.get("BEM_SS2D_FUSED_CORE", "1") != "0")
        fused_cf = fused_core and cf
        z = None

        # the row-blocked stem kernel can only lower when the lane count is
        # 128-divisible or the whole image fits one block (Mosaic rule);
        # tiny CG-stage images (e.g. 28x40 at /16 resolution) fall back to
        # the unfused conv stem below
        from ..ops.gdmlp_fused import fused_rows_ok

        stem_fused_ok = fused_cf and self.d_conv == 3 and fused_rows_ok(H, W)
        ln_in_kernel = ln is not None and stem_fused_ok
        if ln is not None and not ln_in_kernel:
            x = _plain_ln(x, ln, 1 if (cf or flat) else -1)
        if stem_fused_ok:
            from ..ops.gdmlp_fused import stem_fused_cf
            from .layers import Conv2dParams as _ConvP, DenseParams as _DenseP

            k_in, b_in = _DenseP(self.d_model, d_inner, use_bias=self.bias,
                                 name="in_proj", **bayes)()
            k_cv, b_cv = _ConvP(d_inner, d_inner, kernel_size=3,
                                groups=d_inner, use_bias=self.conv_bias,
                                name="conv2d", **bayes)()
            dwtaps = jnp.transpose(k_cv[:, :, 0], (2, 0, 1)).reshape(d_inner, 9)
            # stays (B, d_inner, L): the fused core consumes the flat form
            stem_ln = ln if ln_in_kernel else (None, None)
            xs_in = stem_fused_cf(
                x.reshape(B_, self.d_model, L), jnp.transpose(k_in), b_in,
                dwtaps, b_cv, H, W, stem_ln[0], stem_ln[1],
            )
        else:
            if flat:
                x = x.reshape(B_, self.d_model, H, W)
            # ---- in_proj (+ optional gate z) -------------------------------
            d_proj = d_inner if disable_z else 2 * d_inner
            xz = Dense(d_proj, use_bias=self.bias, name="in_proj",
                       axis=ch_axis, **bayes)(x)
            if not disable_z:
                xs_in, z = jnp.split(xz, 2, axis=ch_axis)
                if not flags["nozact"]:
                    z = jax.nn.silu(z)
            else:
                xs_in = xz

            # ---- depthwise conv + act --------------------------------------
            if self.d_conv > 1:
                xs_in = Conv2d(
                    d_inner,
                    kernel_size=self.d_conv,
                    padding=(self.d_conv - 1) // 2,
                    groups=d_inner,
                    use_bias=self.conv_bias,
                    name="conv2d",
                    data_format="NCHW" if cf else "NHWC",
                    **bayes,
                )(xs_in)
            xs_in = jax.nn.silu(xs_in)

        # ---- SSM parameters (raw, never bayesian — parity with tools.py) ---
        x_proj_weight = self.param(
            "x_proj_weight",
            inits.torch_default_kernel,
            (K, R + 2 * N, d_inner),
        )
        if self.initialize == "v0":
            dt_w_init = inits.dt_proj_weight_init(R, self.dt_scale, self.dt_init)
            dt_b_init = inits.dt_proj_bias_init(self.dt_min, self.dt_max, self.dt_init_floor)
            a_init = inits.a_log_init(N)
            d_init = inits.ones
        else:  # "v1"/"v2" simple inits (vmamba.py:534-545)
            rnd = self.initialize == "v1"
            dt_w_init = (lambda k, s, d=jnp.float32: 0.1 * jax.random.normal(k, s, d)) if rnd else (
                lambda k, s, d=jnp.float32: 0.1 * jax.random.uniform(k, s, d))
            dt_b_init = dt_w_init
            a_init = (lambda k, s, d=jnp.float32: jax.random.normal(k, s, d)) if rnd else inits.zeros
            d_init = inits.ones
        dt_projs_weight = self.param("dt_projs_weight", dt_w_init, (K, d_inner, R))
        dt_projs_bias = self.param("dt_projs_bias", dt_b_init, (K, d_inner))
        A_logs = self.param("A_logs", a_init, (K * d_inner, N))
        Ds = self.param("Ds", d_init, (K * d_inner,))

        # ---- forward_corev2: cross-scan -> proj -> scan -> merge ------------
        A = -jnp.exp(A_logs.astype(jnp.float32))
        dtype = xs_in.dtype
        if fused_core:
            # fully-fused serving path: per-sequence split scan kernels
            # (in-kernel fwd/rev merge, no stacked copy — ops/ss2d_seq.py)
            # and a fused merge+LN+out_proj tail (ops/ss2d_tail.py). The only
            # XLA data movement left in the SS2D core is the two roofline
            # transposes for the column sequence (plus, in NHWC, the
            # boundary transposes into/out of the channel-first core).
            from ..ops.ss2d_fused_g import pick_group
            from ..ops.ss2d_seq import (
                col_pair_supported,
                ss2d_col_pair_g,
                ss2d_seq_pair_g,
            )
            from ..ops.ss2d_tail import ss2d_tail_cf

            if xs_in.ndim == 3:
                xf = xs_in  # flat CF stream, (B, d_inner, L)
            elif cf:
                xf = xs_in.reshape(B_, d_inner, L)
            else:
                xf = jnp.transpose(xs_in, (0, 3, 1, 2)).reshape(
                    B_, d_inner, L)
            G = pick_group(B_, d_inner, 320)
            Bg = B_ // G
            # grouping folds the batch into sublanes; on the (C, L)-tiled
            # flat stream these reshapes are free bitcasts
            row = xf.reshape(Bg, G * d_inner, L)
            A4 = A.reshape(K, d_inner, N)
            D4 = Ds.reshape(K, d_inner)
            y_row = ss2d_seq_pair_g(row, x_proj_weight, dt_projs_weight,
                                    dt_projs_bias, A4, D4, G, "row")
            if col_pair_supported(H, W):
                # transpose-free column pair: the col kernel walks th-row
                # slabs of the ROW-major stream with per-column lane-parallel
                # recurrences — no (L) <-> (W, H) retile round-trip (the
                # transpose chain cost ~150 ms/serving-iter, traced round 4).
                # y_row rides in as the col pair's merge input, so the tail
                # consumes ONE merged stream (one fewer full-size read).
                y_merged = ss2d_col_pair_g(row, x_proj_weight,
                                           dt_projs_weight, dt_projs_bias,
                                           A4, D4, y_row, G, H, W)
                y_row, y_colT = y_merged, None
            else:
                # group-preserving column transpose fallback: the L index is
                # independent of the (B, G·C) sublane packing, so transposing
                # H/W inside the grouped layout is value-identical to
                # ungroup->transpose->regroup but skips the sublane retile
                col = jnp.transpose(
                    row.reshape(Bg, G * d_inner, H, W), (0, 1, 3, 2)
                ).reshape(Bg, G * d_inner, L)
                y_col = ss2d_seq_pair_g(col, x_proj_weight, dt_projs_weight,
                                        dt_projs_bias, A4, D4, G, "col")
                y_colT = jnp.transpose(
                    y_col.reshape(Bg, G * d_inner, W, H), (0, 1, 3, 2)
                ).reshape(Bg, G * d_inner, L)
            on_scale, on_bias = LayerNormParams(d_inner, name="out_norm")()
            wout, bout = DenseParams(
                d_inner, self.d_model, use_bias=self.bias,
                bayesian=self.bayesian, sigma_init=self.sigma_init,
                name="out_proj",
            )()
            use_dropout = self.dropout > 0 and self.has_rng("dropout")
            # the residual stream folds into the tail when it shares the
            # grouped CF layout (free bitcast from the flat stream) and no
            # dropout has to run between out_proj and the add
            res_in_kernel = residual and cf and not use_dropout
            res_g = None
            if res_in_kernel:
                res_g = (x_res if flat else x_res.reshape(
                    B_, self.d_model, L)).reshape(Bg, G * self.d_model, L)
            out = ss2d_tail_cf(y_row, y_colT, on_scale, on_bias, wout,
                               bout, G, res_g)
            if flat:
                out = out.reshape(B_, self.d_model, L)
            else:
                out = out.reshape(B_, self.d_model, H, W)
                if not cf:
                    out = jnp.transpose(out, (0, 2, 3, 1))
            if use_dropout:
                keep = 1.0 - self.dropout
                mask = jax.random.bernoulli(
                    self.make_rng("dropout"), keep, out.shape)
                out = jnp.where(mask, out / keep, 0.0)
            if residual and not res_in_kernel:
                out = out + x_res
            return out
        if scans == 3:
            # cascade2d (vmamba.py:579-654): bidirectional row scan, LN,
            # then bidirectional column scan; directions 0,1 carry the row
            # projections and 2,3 the column projections.
            if cf:
                raise NotImplementedError("cascade2d with layout=NCHW")

            def plain_ln(t):
                tf = t.astype(jnp.float32)
                m = jnp.mean(tf, axis=-1, keepdims=True)
                v = jnp.var(tf, axis=-1, keepdims=True)
                return ((tf - m) * jax.lax.rsqrt(v + 1e-5)).astype(t.dtype)

            def scan_rowcol(t, k0, width):
                # t: (B, H, W, D); k0 selects direction pair {0: rows, 2: cols}
                if width:
                    seq = t.reshape(-1, t.shape[2], d_inner)  # (B*H, W, D)
                else:
                    seq = jnp.transpose(t, (0, 2, 1, 3)).reshape(
                        -1, t.shape[1], d_inner)  # (B*W, H, D)
                Lr = seq.shape[1]
                xs2 = jnp.stack([seq, jnp.flip(seq, axis=1)], axis=1)  # (M,2,L,D)
                pw = x_proj_weight[k0 : k0 + 2].astype(seq.dtype)
                x_dbl = jnp.einsum("mkld,kcd->mklc", xs2, pw,
                                   preferred_element_type=seq.dtype)
                dts2 = jnp.einsum(
                    "mklr,kdr->mkld", x_dbl[..., :R],
                    dt_projs_weight[k0 : k0 + 2].astype(seq.dtype),
                    preferred_element_type=seq.dtype,
                )
                Bs2 = jnp.moveaxis(x_dbl[..., R : R + N], 1, 2)
                Cs2 = jnp.moveaxis(x_dbl[..., R + N :], 1, 2)
                u2 = jnp.moveaxis(xs2, 1, 2).reshape(-1, Lr, 2 * d_inner)
                d2 = jnp.moveaxis(dts2, 1, 2).reshape(-1, Lr, 2 * d_inner)
                A2 = A.reshape(K, d_inner, N)[k0 : k0 + 2].reshape(-1, N)
                D2 = Ds.reshape(K, d_inner)[k0 : k0 + 2].reshape(-1)
                b2 = dt_projs_bias[k0 : k0 + 2].reshape(-1)
                y2 = selective_scan(u2, d2, A2, Bs2, Cs2, D=D2, delta_bias=b2,
                                    delta_softplus=True, backend=backend)
                y2 = y2.reshape(-1, Lr, 2, d_inner).sum(axis=2)  # merge fwd+rev
                if width:
                    return y2.reshape(B_, H, W, d_inner)
                return jnp.transpose(
                    y2.reshape(B_, W, H, d_inner), (0, 2, 1, 3)
                )

            xn = plain_ln(xs_in)  # added0510 to avoid nan (vmamba.py:632)
            y_row = scan_rowcol(xn, 0, width=True).astype(dtype)
            y_row = plain_ln(y_row)  # vmamba.py:643
            y = scan_rowcol(y_row, 2, width=False).astype(jnp.float32)
        elif backend == "pallas" and scans == 0:
            # fully-fused SS2D core (ops/ss2d_fused.py): only the two base
            # directional sequences are materialized; dt/B/C projections,
            # the reversed directions, the scan and the direction-pair merge
            # all happen inside one Pallas kernel. When the batch divides
            # into groups, G images fold into the sublane dim (a pure
            # reshape) so each grid step runs G-wide (ops/ss2d_fused_g.py).
            from ..ops.ss2d_fused_g import pick_group, ss2d_dir_fused_g

            if cf:
                xc = xs_in  # (B, C, H, W)
            else:
                xc = jnp.transpose(xs_in, (0, 3, 1, 2))
            G = pick_group(B_, d_inner)
            if G > 1:
                Bg = B_ // G
                row = xc.reshape(Bg, G * d_inner, L)
                col = jnp.transpose(xc, (0, 1, 3, 2)).reshape(
                    Bg, G * d_inner, L)
                xs2 = jnp.stack([row, col], axis=1)  # (Bg, 2, G*C, L)
                y2 = ss2d_dir_fused_g(
                    xs2, x_proj_weight, dt_projs_weight, dt_projs_bias,
                    A.reshape(K, d_inner, N), Ds.reshape(K, d_inner), G,
                )
                y_row = y2[:, 0].reshape(B_, d_inner, H, W)
                y_col = jnp.transpose(
                    y2[:, 1].reshape(B_, d_inner, W, H), (0, 1, 3, 2)
                )
            else:
                row = xc.reshape(B_, d_inner, L)
                col = jnp.transpose(xc, (0, 1, 3, 2)).reshape(B_, d_inner, L)
                xs2 = jnp.stack([row, col], axis=1)  # (B, 2, C, L)
                y2 = ss2d_dir_fused(
                    xs2, x_proj_weight, dt_projs_weight, dt_projs_bias,
                    A.reshape(K, d_inner, N), Ds.reshape(K, d_inner),
                )
                y_row = y2[:, 0].reshape(B_, d_inner, H, W)
                y_col = jnp.transpose(
                    y2[:, 1].reshape(B_, d_inner, W, H), (0, 1, 3, 2)
                )
            y = (y_row + y_col).astype(jnp.float32)  # (B, C, H, W)
            if not cf:
                y = jnp.transpose(y, (0, 2, 3, 1))
        elif cf:
            # channel-first XLA composition (oracle path)
            xs = cross_scan_cf_input(xs_in, scans=scans)  # (B, K, C, L)
            x_dbl = jnp.einsum(
                "bkcl,krc->bkrl", xs, x_proj_weight.astype(dtype),
                preferred_element_type=dtype,
            )
            dts = jnp.einsum(
                "bkrl,kdr->bkdl", x_dbl[:, :, :R], dt_projs_weight.astype(dtype),
                preferred_element_type=dtype,
            )
            Bs = x_dbl[:, :, R : R + N]
            Cs = x_dbl[:, :, R + N :]
            if backend == "pallas":
                ys = selective_scan_fused(
                    xs, dts, A, Bs, Cs, D=Ds,
                    delta_bias=dt_projs_bias.reshape(-1), delta_softplus=True,
                )
            else:
                from ..ops.scan_fused import _reference_unfolded

                M = B_ * K
                ys = _reference_unfolded(
                    xs.reshape(M, d_inner, L), dts.reshape(M, d_inner, L),
                    jnp.broadcast_to(
                        A.reshape(1, K, d_inner, N), (B_, K, d_inner, N)
                    ).reshape(M, d_inner, N),
                    Bs.reshape(M, N, L), Cs.reshape(M, N, L),
                    jnp.broadcast_to(
                        Ds.reshape(1, K, d_inner, 1), (B_, K, d_inner, 1)
                    ).reshape(M, d_inner, 1),
                    jnp.broadcast_to(
                        dt_projs_bias.reshape(1, K, d_inner, 1),
                        (B_, K, d_inner, 1),
                    ).reshape(M, d_inner, 1),
                    True,
                ).reshape(B_, K, d_inner, L)
            y = cross_merge_cf_output(ys.astype(dtype), H, W, scans=scans)
        elif backend == "pallas":
            # non-cross2d scan modes: channel-first (L-minor) pipeline with
            # the blockwise scan kernel (ops/scan_fused.py)
            xs = cross_scan_cf(xs_in, scans=scans)  # (B, K, C, L)
            x_dbl = jnp.einsum(
                "bkcl,krc->bkrl", xs, x_proj_weight.astype(dtype),
                preferred_element_type=dtype,
            )
            dts = jnp.einsum(
                "bkrl,kdr->bkdl", x_dbl[:, :, :R], dt_projs_weight.astype(dtype),
                preferred_element_type=dtype,
            )
            Bs = x_dbl[:, :, R : R + N]  # (B, K, N, L)
            Cs = x_dbl[:, :, R + N :]
            ys = selective_scan_fused(
                xs, dts, A, Bs, Cs,
                D=Ds,
                delta_bias=dt_projs_bias.reshape(-1),
                delta_softplus=True,
            )  # (B, K, C, L) fp32
            y = cross_merge_cf(ys, H, W, scans=scans)  # (B, H, W, C) fp32
        else:
            xs = cross_scan(xs_in, scans=scans)  # (B, K, L, D)
            x_dbl = jnp.einsum(
                "bkld,kcd->bklc", xs, x_proj_weight.astype(dtype),
                preferred_element_type=dtype,
            )
            dts = jnp.einsum(
                "bklr,kdr->bkld", x_dbl[..., :R], dt_projs_weight.astype(dtype),
                preferred_element_type=dtype,
            )
            Bs = x_dbl[..., R : R + N]
            Cs = x_dbl[..., R + N :]
            # fold K into channels (k-major, matching A_logs/Ds flattening)
            u = jnp.moveaxis(xs, 1, 2).reshape(B_, L, K * d_inner)
            delta = jnp.moveaxis(dts, 1, 2).reshape(B_, L, K * d_inner)
            Bs_f = jnp.moveaxis(Bs, 1, 2)  # (B, L, K, N)
            Cs_f = jnp.moveaxis(Cs, 1, 2)
            if force_fp32:
                u, delta, Bs_f, Cs_f = (
                    t.astype(jnp.float32) for t in (u, delta, Bs_f, Cs_f)
                )
            y = selective_scan(
                u, delta, A, Bs_f, Cs_f,
                D=Ds,
                delta_bias=dt_projs_bias.reshape(-1),
                delta_softplus=True,
                backend=backend,
            )  # (B, L, K*D) fp32
            ys = jnp.moveaxis(y.reshape(B_, L, K, d_inner), 2, 1)
            y = cross_merge(ys, H, W, scans=scans)  # (B, H, W, D) fp32

        # ---- out norm -------------------------------------------------------
        on = flags["out_norm"]
        df = "NCHW" if cf else "NHWC"
        if on == "ln":
            y = LayerNorm2d(name="out_norm", axis=ch_axis)(y)
        elif on == "none":
            pass
        elif on == "softmax":
            if cf:
                y = jax.nn.softmax(y.reshape(B_, -1, L), axis=-1).reshape(
                    B_, -1, H, W)
            else:
                y = jax.nn.softmax(y.reshape(B_, L, -1), axis=1).reshape(
                    B_, H, W, -1)
        elif on == "sigmoid":
            y = jax.nn.sigmoid(y)
        elif on == "dwconv3":
            y = Conv2d(d_inner, 3, padding=1, groups=d_inner, use_bias=False,
                       name="out_norm", data_format=df)(y)
        elif on == "cnorm":
            y = LayerNorm2d(name="out_norm", axis=ch_axis)(y)
            y = Conv2d(d_inner, 3, padding=1, groups=d_inner, use_bias=False,
                       name="out_norm_conv", data_format=df)(y)
        y = y.astype(x.dtype)

        if flags["oact"]:
            y = _gelu_exact(y)
        if not disable_z:
            y = y * z
        out = Dense(self.d_model, use_bias=self.bias, name="out_proj",
                    axis=ch_axis, **bayes)(y)
        if self.dropout > 0 and self.has_rng("dropout"):
            keep = 1.0 - self.dropout
            mask = jax.random.bernoulli(self.make_rng("dropout"), keep, out.shape)
            out = jnp.where(mask, out / keep, 0.0)
        if flat:
            out = out.reshape(B_, self.d_model, L)
        if residual:
            out = out + x_res
        return out

    def _forward_m0(self, x: jax.Array, base: str, flags) -> jax.Array:
        """mamba2/SSD forward (SS2Dm0, vmamba.py:967-1157): heads = K*R with
        headdim d_inner/R; chunked SSD scan (ops/ssd.py) instead of the
        per-channel selective scan; plain LN out-norm."""
        from ..ops.ssd import ssd_chunk_scan

        act = {"silu": jax.nn.silu, "gelu": jax.nn.gelu}[self.act_layer]

        if base != "m0":
            raise NotImplementedError(f"forward_type base {base!r}")
        if self.layout == "NCHW":
            raise NotImplementedError("m0 with layout=NCHW")

        d_inner = int(self.ssm_ratio * self.d_model)
        R = math.ceil(self.d_model / 16) if self.dt_rank == "auto" else self.dt_rank
        if d_inner % R:
            raise ValueError(f"d_inner {d_inner} not divisible by dt_rank {R}")
        N = self.d_state
        K = 4
        Dh = d_inner // R  # headdim
        B_, H, W, _ = x.shape
        L = H * W
        disable_z = flags["noz"]
        bayes = dict(bayesian=self.bayesian, sigma_init=self.sigma_init)

        # ---- in_proj / conv / act (GELU for m0, vmamba.py:982) -------------
        d_proj = d_inner if disable_z else 2 * d_inner
        xz = Dense(d_proj, use_bias=self.bias, name="in_proj", **bayes)(x)
        if not disable_z:
            xs_in, z = jnp.split(xz, 2, axis=-1)
            if not flags["nozact"]:
                z = act(z)
        else:
            xs_in = xz
        if self.d_conv > 1:
            xs_in = Conv2d(d_inner, kernel_size=self.d_conv,
                           padding=(self.d_conv - 1) // 2, groups=d_inner,
                           use_bias=self.conv_bias, name="conv2d", **bayes)(xs_in)
        xs_in = act(xs_in)

        # ---- SSM params (initialize v1/v2, vmamba.py:1056-1066) ------------
        x_proj_weight = self.param(
            "x_proj_weight", inits.torch_default_kernel, (K, R + 2 * N, d_inner)
        )
        if self.initialize in ("v0", "v1"):
            a_init = lambda k, s, d=jnp.float32: jax.random.normal(k, s, d)
            b_init = lambda k, s, d=jnp.float32: 0.1 * jax.random.normal(k, s, d)
        else:  # "v2"
            a_init = inits.zeros
            b_init = lambda k, s, d=jnp.float32: 0.1 * jax.random.uniform(k, s, d)
        A_logs = self.param("A_logs", a_init, (K, R))
        Ds = self.param("Ds", inits.ones, (K, R, Dh))
        dt_projs_bias = self.param("dt_projs_bias", b_init, (K, R))

        init_state = None
        if self.with_initial_state:
            state_var = self.variable(
                "ssm_state", "initial_state",
                lambda: jnp.zeros((1, K * R, Dh, N), jnp.float32),
            )
            init_state = jnp.broadcast_to(
                state_var.value, (B_, K * R, Dh, N)
            )

        # ---- cross-scan -> projections -> SSD -> merge ---------------------
        dtype = xs_in.dtype
        xs = cross_scan(xs_in, scans=0)  # (B, K, L, d_inner)
        x_dbl = jnp.einsum(
            "bkld,kcd->bklc", xs, x_proj_weight.astype(dtype),
            preferred_element_type=dtype,
        )
        dts = x_dbl[..., :R]                    # (B, K, L, R)
        Bs = x_dbl[..., R : R + N]              # (B, K, L, N)
        Cs = x_dbl[..., R + N :]

        # heads: KR of headdim Dh (forward_corem0, vmamba.py:1100-1110)
        xs_h = jnp.moveaxis(xs, 1, 2).reshape(B_, L, K * R, Dh)
        dts_h = jnp.moveaxis(dts, 1, 2).reshape(B_, L, K * R)
        Bs_h = jnp.moveaxis(Bs, 1, 2)           # (B, L, K, N) groups=K
        Cs_h = jnp.moveaxis(Cs, 1, 2)
        As = -jnp.exp(A_logs.astype(jnp.float32)).reshape(K * R)
        ys, final_state = ssd_chunk_scan(
            xs_h, dts_h, As, Bs_h, Cs_h, chunk_size=self.chunk_size,
            D=Ds.astype(jnp.float32).reshape(K * R, Dh),
            dt_bias=dt_projs_bias.astype(jnp.float32).reshape(K * R),
            initial_states=init_state, dt_softplus=True,
            return_final_states=True,
        )
        if (self.with_initial_state and not self.is_initializing()
                and self.is_mutable_collection("ssm_state")):
            state_var.value = jnp.sum(
                final_state, axis=0, keepdims=True
            ).astype(jnp.float32)
        ys = jnp.moveaxis(ys.reshape(B_, L, K, d_inner), 2, 1)  # (B, K, L, D)
        y = cross_merge(ys.astype(dtype), H, W, scans=0)  # (B, H, W, D)

        # ---- out norm + gate + out_proj ------------------------------------
        on = flags["out_norm"]
        if on == "ln":
            y = LayerNorm2d(name="out_norm")(y)
        elif on == "none":
            pass
        elif on == "sigmoid":
            y = jax.nn.sigmoid(y)
        elif on == "softmax":
            y = jax.nn.softmax(y.reshape(B_, L, -1), axis=1).reshape(B_, H, W, -1)
        elif on == "dwconv3":
            y = Conv2d(d_inner, 3, padding=1, groups=d_inner, use_bias=False,
                       name="out_norm")(y)
        elif on == "cnorm":
            y = LayerNorm2d(name="out_norm")(y)
            y = Conv2d(d_inner, 3, padding=1, groups=d_inner, use_bias=False,
                       name="out_norm_conv")(y)
        y = y.astype(x.dtype)
        if flags["oact"]:
            y = _gelu_exact(y)
        if not disable_z:
            y = y * z
        out = Dense(self.d_model, use_bias=self.bias, name="out_proj", **bayes)(y)
        if self.dropout > 0 and self.has_rng("dropout"):
            keep = 1.0 - self.dropout
            mask = jax.random.bernoulli(self.make_rng("dropout"), keep, out.shape)
            out = jnp.where(mask, out / keep, 0.0)
        return out
