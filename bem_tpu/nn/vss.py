"""VSSBlock and its MLP variants.

Parity targets: VSSBlock (vmamba.py:1241-1377), gdMlp (vmamba.py:116-133),
Mlp (vmamba.py:167-185), gMlp (vmamba.py:188-206), FFNv02 (vmamba.py:140-164).
All channels-last. The ``bayesian`` flag propagates to every conv/linear that
the reference's convert2bnn would swap inside a block (tools.py:53-63).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv2d, Dense, DropPath, LayerNorm2d
from .ss2d import SS2D


def _gelu_exact(x):
    # torch nn.GELU default is the exact erf form; jax.nn.gelu
    # defaults to the tanh approximation (a ~1e-3 systematic
    # parity error that compounds over deep stacks)
    import jax
    return jax.nn.gelu(x, approximate=False)


class GDMlp(nn.Module):
    """Gated-dconv MLP: 1x1 -> dw3x3 -> chunk -> GELU(x1)*x2 -> 1x1."""

    hidden_features: int
    out_features: int
    bayesian: bool = False
    sigma_init: float = 0.05
    layout: str = "NHWC"

    @nn.compact
    def __call__(self, x: jax.Array, hw: Optional[tuple] = None,
                 ln=None, residual: bool = False) -> jax.Array:
        h = self.hidden_features
        if self.layout == "NCHW":
            # fully-fused CF path: 1x1 -> dw3x3 -> gate -> 1x1 in one pallas
            # program (ops/gdmlp_fused.py) — the 2h hidden never round-trips
            # HBM. Parameter tree identical to the unfused Conv2d stack.
            # Accepts the flat (B, C, H*W) stream with hw=(H, W) and then
            # returns it flat (see SS2D.__call__ on why flat CF matters).
            from ..ops.gdmlp_fused import fused_rows_ok, gdmlp_fused_cf
            from .layers import Conv2dParams

            bayes = dict(bayesian=self.bayesian, sigma_init=self.sigma_init)
            flat = x.ndim == 3
            if flat:
                B, C, _ = x.shape
                H, W = hw
            else:
                B, C, H, W = x.shape
            if not fused_rows_ok(H, W):
                # Mosaic can't lower the row-blocked kernel at this size
                # (lane count neither 128-divisible nor full-array): run the
                # unfused CF conv stack — identical params and semantics,
                # with the optional pre-LN and residual applied here
                from .ss2d import _plain_ln

                x4 = x.reshape(B, C, H, W)
                x_res = x4
                if ln is not None:
                    x4 = _plain_ln(x4, ln, 1)
                cbayes = dict(bayes, data_format="NCHW")
                y = Conv2d(2 * h, kernel_size=1, padding=0,
                           name="project_in", **cbayes)(x4)
                y = Conv2d(2 * h, kernel_size=3, padding=1, groups=2 * h,
                           name="dwconv", **cbayes)(y)
                y1, y2 = jnp.split(y, 2, axis=1)
                y = _gelu_exact(y1) * y2
                y = Conv2d(self.out_features, kernel_size=1, padding=0,
                           name="project_out", **cbayes)(y)
                if residual:
                    y = y + x_res
                return y.reshape(B, -1, H * W) if flat else y
            k_in, b_in = Conv2dParams(C, 2 * h, kernel_size=1,
                                      name="project_in", **bayes)()
            k_dw, b_dw = Conv2dParams(2 * h, 2 * h, kernel_size=3,
                                      groups=2 * h, name="dwconv", **bayes)()
            k_out, b_out = Conv2dParams(h, self.out_features, kernel_size=1,
                                        name="project_out", **bayes)()
            W1 = jnp.transpose(k_in[0, 0])                    # (2h, C)
            dw = jnp.transpose(k_dw[:, :, 0], (2, 0, 1)).reshape(2 * h, 9)
            W2 = jnp.transpose(k_out[0, 0])                   # (Cout, h)
            lns, lnb = ln if ln is not None else (None, None)
            out = gdmlp_fused_cf(x.reshape(B, C, H * W), W1, b_in, dw, b_dw,
                                 W2, b_out, H, W, lns, lnb, residual)
            if flat:
                return out
            return out.reshape(B, self.out_features, H, W)
        bayes = dict(bayesian=self.bayesian, sigma_init=self.sigma_init,
                     data_format=self.layout)
        x = Conv2d(2 * h, kernel_size=1, padding=0, name="project_in", **bayes)(x)
        x = Conv2d(2 * h, kernel_size=3, padding=1, groups=2 * h, name="dwconv", **bayes)(x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        x = _gelu_exact(x1) * x2
        return Conv2d(self.out_features, kernel_size=1, padding=0, name="project_out", **bayes)(x)


class Mlp(nn.Module):
    hidden_features: int
    out_features: int
    bayesian: bool = False
    sigma_init: float = 0.05

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        bayes = dict(bayesian=self.bayesian, sigma_init=self.sigma_init)
        x = Dense(self.hidden_features, name="fc1", **bayes)(x)
        x = _gelu_exact(x)
        return Dense(self.out_features, name="fc2", **bayes)(x)


class GMlp(nn.Module):
    hidden_features: int
    out_features: int
    bayesian: bool = False
    sigma_init: float = 0.05

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        bayes = dict(bayesian=self.bayesian, sigma_init=self.sigma_init)
        x = Dense(2 * self.hidden_features, name="fc1", **bayes)(x)
        x, z = jnp.split(x, 2, axis=-1)
        return Dense(self.out_features, name="fc2", **bayes)(x * _gelu_exact(z))


class FFNv02(nn.Module):
    hidden_features: int
    out_features: int
    bayesian: bool = False
    sigma_init: float = 0.05

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        bayes = dict(bayesian=self.bayesian, sigma_init=self.sigma_init)
        h = self.hidden_features
        x = Conv2d(h, 1, padding=0, use_bias=False, name="net_0", **bayes)(x)
        x = _gelu_exact(x)
        x = Conv2d(h, 3, padding=1, groups=h, use_bias=False, name="net_2", **bayes)(x)
        x = _gelu_exact(x)
        return Conv2d(self.out_features, 1, padding=0, use_bias=False, name="net_4", **bayes)(x)


_MLPS = {"gdmlp": GDMlp, "mlp": Mlp, "gmlp": GMlp, "ffnv02": FFNv02}


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) -> (B*nH*nW, ws, ws, C) (vmamba.py:1207-1222)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws, ws, C)


def window_reverse(win: jax.Array, ws: int, H: int, W: int) -> jax.Array:
    B = win.shape[0] // ((H // ws) * (W // ws))
    x = win.reshape(B, H // ws, W // ws, ws, ws, -1)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, H, W, -1)


class VSSBlock(nn.Module):
    hidden_dim: int
    drop_path: float = 0.0
    ssm_d_state: int = 1
    ssm_ratio: float = 1.0
    ssm_dt_rank: Any = "auto"
    ssm_conv: int = 3
    ssm_conv_bias: bool = False
    ssm_drop_rate: float = 0.0
    ssm_init: str = "v0"
    forward_type: str = "v05_noz"
    mlp_ratio: float = 4.0
    mlp_drop_rate: float = 0.0
    mlp_type: str = "gdmlp"
    post_norm: bool = False
    grid_size: Optional[int] = None
    use_checkpoint: bool = False
    bayesian: bool = False
    sigma_init: float = 0.05
    scan_backend: Optional[str] = None
    layout: str = "NHWC"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ssm_branch = self.ssm_ratio > 0
        cf = self.layout == "NCHW"
        ch_axis = 1 if cf else -1
        mlp_branch = self.mlp_ratio > 0
        drop = DropPath(self.drop_path, name="drop_path")

        # CF interior runs on the flattened (B, C, H*W) stream: the two
        # minor dims carry the TPU tile layout, so keeping (C, L) minor
        # across LN/SS2D/MLP/residual makes the fused kernels' grouping
        # reshapes bitcasts instead of (H, W)-retiling copies
        hw = None
        if cf:
            if self.grid_size:
                raise NotImplementedError("grid_size with layout='NCHW'")
            B_, C_, H_, W_ = x.shape
            hw = (H_, W_)
            x = x.reshape(B_, C_, H_ * W_)

        # activation checkpointing (vmamba.py:1373-1377): remat the SS2D and
        # MLP submodules so their activations are recomputed in backward —
        # trades FLOPs for peak HBM at train time, no-op at inference.
        # In the CF case hw (arg 2, counting self) and residual (arg 4) are
        # static
        if self.use_checkpoint:
            ss2d_cls = (nn.remat(SS2D, static_argnums=(2, 4)) if cf
                        else nn.remat(SS2D))
        else:
            ss2d_cls = SS2D
        mlp_cls = _MLPS[self.mlp_type]
        if self.use_checkpoint:
            mlp_cls = (nn.remat(mlp_cls, static_argnums=(2, 4))
                       if cf and self.mlp_type == "gdmlp"
                       else nn.remat(mlp_cls))

        def run_op(h, ln=None, residual=False):
            op = ss2d_cls(
                d_model=self.hidden_dim,
                d_state=self.ssm_d_state,
                ssm_ratio=self.ssm_ratio,
                dt_rank=self.ssm_dt_rank,
                d_conv=self.ssm_conv,
                conv_bias=self.ssm_conv_bias,
                dropout=self.ssm_drop_rate,
                initialize=self.ssm_init,
                forward_type=self.forward_type,
                bayesian=self.bayesian,
                sigma_init=self.sigma_init,
                scan_backend=self.scan_backend,
                layout=self.layout,
                name="op",
            )
            if not self.grid_size:
                return op(h, hw, ln, residual) if cf else op(h)
            # windowed SS2D (vmamba.py:1336-1365): pad to window multiple,
            # partition, scan per window, reverse, crop
            ws = self.grid_size
            B, H, W, C = h.shape
            pad_b = (ws - H % ws) % ws
            pad_r = (ws - W % ws) % ws
            hp = jnp.pad(h, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            Hp, Wp = H + pad_b, W + pad_r
            wins = window_partition(hp, ws)
            wins = op(wins)
            out = window_reverse(wins, ws, Hp, Wp)
            return out[:, :H, :W, :]

        if ssm_branch:
            if cf and not self.post_norm and self.drop_path == 0.0:
                # x + SS2D(LN(x)) with LN and the residual folded into the
                # SS2D kernels (stem / tail) — parameter tree identical to
                # the LayerNorm2d module path
                from .layers import LayerNormParams

                ns, nb = LayerNormParams(self.hidden_dim, name="norm")()
                x = run_op(x, (ns, nb), True)
            else:
                norm = LayerNorm2d(name="norm", axis=ch_axis)
                if self.post_norm:
                    x = x + drop(norm(run_op(x)))
                else:
                    x = x + drop(run_op(norm(x)))
        if mlp_branch:
            mlp_kwargs = dict(
                hidden_features=int(self.hidden_dim * self.mlp_ratio),
                out_features=self.hidden_dim,
                bayesian=self.bayesian,
                sigma_init=self.sigma_init,
                name="mlp",
            )
            if self.mlp_type == "gdmlp":
                mlp_kwargs["layout"] = self.layout
            elif self.layout != "NHWC":
                raise NotImplementedError(
                    f"layout=NCHW with mlp_type={self.mlp_type}"
                )
            mlp = mlp_cls(**mlp_kwargs)
            gd_cf = cf and self.mlp_type == "gdmlp"
            if gd_cf and not self.post_norm and self.drop_path == 0.0:
                # x + gdMlp(LN(x)) in one fused kernel call
                from .layers import LayerNormParams

                n2s, n2b = LayerNormParams(self.hidden_dim, name="norm2")()
                x = mlp(x, hw, (n2s, n2b), True)
            else:
                norm2 = LayerNorm2d(name="norm2", axis=ch_axis)
                mlp_args = (hw, None, False) if gd_cf else ()
                if self.post_norm:
                    x = x + drop(norm2(mlp(x, *mlp_args)))
                else:
                    x = x + drop(mlp(norm2(x), *mlp_args))
        if cf:
            x = x.reshape(B_, C_, H_, W_)
        return x
