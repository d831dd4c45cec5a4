"""Core layers: channels-last convs/dense with optional Bayesian reparameterization.

Every layer here doubles as its own Bayesian (mean-field Gaussian) variant —
the TPU-native answer to the reference's post-hoc module swapping
(basicsr/bayesian/tools.py:48-63 replacing Conv2d/Linear with
``*Reparameterization`` classes, conv.py:10-135, linear.py:8-202):

- ``bayesian=False``: plain layer, params {kernel, bias}.
- ``bayesian=True``: params {mu_kernel, rho_kernel[, mu_bias, rho_bias]},
  an EMA *prior* copy lives in the ``bayes_prior`` variable collection, and
  the weight is sampled ``w = mu + softplus(rho) * eps`` **iff** a ``bayes``
  PRNG stream is supplied to ``apply`` — so "deterministic mode"
  (reference set_prediction_type, tools.py:65-73) is simply *not passing the
  rng*, and K-sample inference is ``vmap`` over K rngs.

The prior EMA update and the KL loss are pure tree functions over
(params, bayes_prior) in :mod:`bem_tpu.bayesian.tools` — run once per train
step instead of mutating state inside each forward (conv.py:91-104).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import init as inits

Dtype = Any


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v)


def softplus_sigma(rho: jax.Array) -> jax.Array:
    """σ = log1p(exp(ρ)) (reference conv.py:106)."""
    return jax.nn.softplus(rho)


def rho_from_sigma(sigma: float) -> float:
    """Inverse softplus used for ρ init (reference conv.py:74)."""
    return math.log(math.expm1(abs(sigma)) + 1e-20)


class _BayesParamMixin:
    """Shared machinery to declare (mu, rho) + prior and sample a weight."""

    def _bayes_weight(self, name: str, init_fn, shape, sigma_init: float):
        rho_init = rho_from_sigma(sigma_init)
        mu = self.param(f"mu_{name}", init_fn, shape)
        rho = self.param(f"rho_{name}", inits.constant(rho_init), shape)
        # The EMA prior copy is NOT a module variable: it is derived from the
        # params tree post-init (bem_tpu.bayesian.tools.extract_bayes_prior)
        # and carried in the TrainState, so apply() needs no extra collection.
        if self.has_rng("bayes"):
            eps = jax.random.normal(self.make_rng("bayes"), shape, jnp.float32)
            return mu + softplus_sigma(rho) * eps
        return mu


class Conv2d(nn.Module, _BayesParamMixin):
    """Conv with HWIO kernels. `padding` may be 'SAME'/'VALID', int, or pair;
    `reflect=True` uses reflection padding (QD model3/4 ReflectionConvBlock).

    data_format 'NHWC' (default) uses the XLA conv; 'NCHW' (channel-first,
    W-minor — the TPU-compact layout for narrow channel counts) lowers to a
    shifted-slice stencil of dense taps, sharing the SAME parameters.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[str, int, Tuple[int, int]] = "SAME"
    groups: int = 1
    use_bias: bool = True
    reflect: bool = False
    kernel_init: Callable = inits.torch_default_kernel
    bias_init: Optional[Callable] = None  # default: torch uniform(±1/sqrt(fan_in))
    bayesian: bool = False
    sigma_init: float = 0.05
    dtype: Optional[Dtype] = None
    data_format: str = "NHWC"
    # for 1x1 convs: emit the opposite layout, folding the transpose into
    # the projection matmul (one HBM pass instead of matmul + copy) — the
    # mixed-layout bridge between the channel-first residual stream and
    # NHWC inner segments (e.g. the 2*hidden gdMlp dwconv, which is
    # lane-dense in NHWC)
    out_format: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = _pair(self.kernel_size)
        cf = self.data_format == "NCHW"
        in_ch = x.shape[1] if cf else x.shape[-1]
        assert in_ch % self.groups == 0, (in_ch, self.groups)
        kshape = (kh, kw, in_ch // self.groups, self.features)
        fan_in = (in_ch // self.groups) * kh * kw

        if self.bayesian:
            kernel = self._bayes_weight("kernel", self.kernel_init, kshape, self.sigma_init)
        else:
            kernel = self.param("kernel", self.kernel_init, kshape)

        bias = None
        if self.use_bias:
            b_init = self.bias_init or inits.torch_default_bias(fan_in)
            if self.bayesian:
                bias = self._bayes_weight("bias", b_init, (self.features,), self.sigma_init)
            else:
                bias = self.param("bias", b_init, (self.features,))

        dtype = self.dtype or x.dtype
        flip = (self.out_format is not None
                and self.out_format != self.data_format)
        if flip:
            assert (kh, kw) == (1, 1) and self.groups == 1, (
                "out_format only supports 1x1 dense convs")
            k = kernel.astype(dtype)[0, 0]
            if cf:  # NCHW in -> NHWC out
                y = jnp.einsum("bchw,cd->bhwd", x.astype(dtype), k,
                               preferred_element_type=dtype)
                if bias is not None:
                    y = y + bias.astype(dtype)
            else:  # NHWC in -> NCHW out
                y = jnp.einsum("bhwc,cd->bdhw", x.astype(dtype), k,
                               preferred_element_type=dtype)
                if bias is not None:
                    y = y + bias.astype(dtype)[None, :, None, None]
            return y
        if cf:
            return self._call_cf(x, kernel, bias, kh, kw, dtype)

        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif isinstance(pad, (tuple, list)) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))

        if self.reflect:
            ph, pw = (kh - 1) // 2, (kw - 1) // 2
            x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode="reflect")
            pad = "VALID"

        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=_pair(self.strides),
            padding=pad,
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            y = y + bias.astype(dtype)
        return y

    def _call_cf(self, x, kernel, bias, kh, kw, dtype):
        """Channel-first stencil: y = sum_taps W[tap] applied to shifted x."""
        B, C, H, W = x.shape
        sh, sw = _pair(self.strides)
        pad = self.padding
        if pad == "SAME":
            ph, pw = (kh - 1) // 2, (kw - 1) // 2
        elif pad == "VALID":
            ph = pw = 0
        elif isinstance(pad, int):
            ph = pw = pad
        else:
            ph, pw = pad if isinstance(pad[0], int) else (pad[0][0], pad[1][0])
        mode = "reflect" if self.reflect else "constant"
        xp = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)), mode=mode).astype(dtype)
        Ho = (H + 2 * ph - kh) // sh + 1
        Wo = (W + 2 * pw - kw) // sw + 1
        kernel = kernel.astype(dtype)

        out = None
        for dy in range(kh):
            for dx in range(kw):
                sl = xp[:, :, dy : dy + (Ho - 1) * sh + 1 : sh,
                        dx : dx + (Wo - 1) * sw + 1 : sw]
                w = kernel[dy, dx]  # (Cin/groups, Cout)
                if self.groups == C and self.features == C:
                    term = w[0][None, :, None, None] * sl  # depthwise
                elif self.groups == 1:
                    term = jnp.einsum("bchw,cd->bdhw", sl, w,
                                      preferred_element_type=dtype)
                else:
                    g = self.groups
                    cg = C // g
                    og = self.features // g
                    slg = sl.reshape(B, g, cg, Ho, Wo)
                    wg = w.reshape(g, cg, og) if False else None
                    # grouped: kernel (cg, Cout) with Cout split over groups
                    term = jnp.einsum(
                        "bgchw,gcd->bgdhw", slg,
                        w.reshape(cg, g, og).transpose(1, 0, 2),
                        preferred_element_type=dtype,
                    ).reshape(B, self.features, Ho, Wo)
                out = term if out is None else out + term
        if bias is not None:
            out = out + bias.astype(dtype)[None, :, None, None]
        return out


class ConvTranspose2d(nn.Module):
    """Transposed conv (reference deconv_up: k=2, s=2, UNet_arch.py:85-93).

    data_format 'NCHW' supports only kernel == stride (the non-overlapping
    k2s2 case every arch uses): each output 2x2 cell is a dense map of the
    input pixel, interleaved by reshape."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 2
    strides: Union[int, Tuple[int, int]] = 2
    use_bias: bool = True
    kernel_init: Callable = inits.torch_default_kernel
    dtype: Optional[Dtype] = None
    data_format: str = "NHWC"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = _pair(self.kernel_size)
        cf = self.data_format == "NCHW"
        in_ch = x.shape[1] if cf else x.shape[-1]
        kshape = (kh, kw, in_ch, self.features)
        # torch fan_in for ConvTranspose counts out-channels side; use in_ch*k*k
        fan_in = in_ch * kh * kw
        kernel = self.param("kernel", self.kernel_init, kshape)
        dtype = self.dtype or x.dtype
        bias = None
        if self.use_bias:
            bias = self.param("bias", inits.torch_default_bias(fan_in),
                              (self.features,))
        if cf:
            sh, sw = _pair(self.strides)
            assert (kh, kw) == (sh, sw), "NCHW conv_transpose needs k == s"
            B, C, H, W = x.shape
            # (kh, kw, B, O, H, W) per-tap dense maps
            # conv_transpose places kernel taps mirrored relative to the
            # output cell offsets (matches the NHWC lax.conv_transpose path)
            taps = jnp.einsum("bchw,xyco->xybohw",
                              x.astype(dtype),
                              kernel[::-1, ::-1].astype(dtype),
                              preferred_element_type=dtype)
            # interleave: out[:, o, H*kh, W*kw]
            y = jnp.transpose(taps, (2, 3, 4, 0, 5, 1))  # (B, O, H, kh, W, kw)
            y = y.reshape(B, self.features, H * kh, W * kw)
            if bias is not None:
                y = y + bias.astype(dtype)[None, :, None, None]
            return y
        y = jax.lax.conv_transpose(
            x.astype(dtype),
            kernel.astype(dtype),
            strides=_pair(self.strides),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            y = y + bias.astype(dtype)
        return y


class Dense(nn.Module, _BayesParamMixin):
    """Linear over the channel axis (== reference Linear2d applied as 1x1
    conv, vmamba.py:42-51). axis=1 serves the channel-first layout with the
    same (in, out) params."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = inits.torch_default_kernel
    bias_init: Optional[Callable] = None
    bayesian: bool = False
    sigma_init: float = 0.05
    dtype: Optional[Dtype] = None
    axis: int = -1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[self.axis]
        kshape = (in_ch, self.features)
        if self.bayesian:
            kernel = self._bayes_weight("kernel", self.kernel_init, kshape, self.sigma_init)
        else:
            kernel = self.param("kernel", self.kernel_init, kshape)
        dtype = self.dtype or x.dtype
        if self.axis in (-1, x.ndim - 1):
            y = jnp.dot(x.astype(dtype), kernel.astype(dtype),
                        preferred_element_type=dtype)
        elif self.axis == 1 and x.ndim == 4:
            y = jnp.einsum("bchw,cd->bdhw", x.astype(dtype),
                           kernel.astype(dtype), preferred_element_type=dtype)
        else:
            raise NotImplementedError(f"Dense axis={self.axis} ndim={x.ndim}")
        if self.use_bias:
            b_init = self.bias_init or inits.torch_default_bias(in_ch)
            if self.bayesian:
                bias = self._bayes_weight("bias", b_init, (self.features,), self.sigma_init)
            else:
                bias = self.param("bias", b_init, (self.features,))
            b = bias.astype(dtype)
            if self.axis == 1 and x.ndim == 4:
                b = b[None, :, None, None]
            y = y + b
        return y


class LayerNorm2d(nn.Module):
    """LayerNorm over the channel axis. In NHWC this is a plain last-axis LN —
    the reference needed permutes around it (vmamba.py:58-63). axis=1 serves
    the channel-first layout with the same (C,) params."""

    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    axis: int = -1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=self.axis, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=self.axis, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        C = x.shape[self.axis]
        shape = [1] * x.ndim
        shape[self.axis] = C
        if self.use_scale:
            y = y * self.param("scale", inits.ones, (C,)).reshape(shape)
        if self.use_bias:
            y = y + self.param("bias", inits.zeros, (C,)).reshape(shape)
        return y.astype(dtype)


class GroupNorm(nn.Module):
    """GroupNorm for NHWC (QD ReflectionConvBlock uses GroupNorm(1, C) — i.e.
    LayerNorm over (H, W, C), model4.py:57)."""

    num_groups: int = 1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dtype = x.dtype
        B, H, W, C = x.shape
        G = self.num_groups
        xf = x.astype(jnp.float32).reshape(B, H, W, G, C // G)
        mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4), keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + self.epsilon)).reshape(B, H, W, C)
        y = y * self.param("scale", inits.ones, (C,)) + self.param("bias", inits.zeros, (C,))
        return y.astype(dtype)


class DropPath(nn.Module):
    """Per-sample stochastic depth. Active only when a 'dropout' rng is given."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.rate == 0.0 or not self.has_rng("dropout"):
            return x
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x


class DenseParams(nn.Module, _BayesParamMixin):
    """Declares exactly Dense's parameter tree (incl. the Bayesian variant)
    and returns the weight VALUES instead of applying them — the bridge that
    lets a fused pallas kernel consume a submodule's parameters while the
    checkpoint tree stays identical to the unfused :class:`Dense`."""

    in_features: int
    features: int
    use_bias: bool = True
    kernel_init: Callable = inits.torch_default_kernel
    bias_init: Optional[Callable] = None
    bayesian: bool = False
    sigma_init: float = 0.05

    @nn.compact
    def __call__(self):
        kshape = (self.in_features, self.features)
        if self.bayesian:
            kernel = self._bayes_weight("kernel", self.kernel_init, kshape,
                                        self.sigma_init)
        else:
            kernel = self.param("kernel", self.kernel_init, kshape)
        bias = None
        if self.use_bias:
            b_init = self.bias_init or inits.torch_default_bias(self.in_features)
            if self.bayesian:
                bias = self._bayes_weight("bias", b_init, (self.features,),
                                          self.sigma_init)
            else:
                bias = self.param("bias", b_init, (self.features,))
        return kernel, bias


class Conv2dParams(nn.Module, _BayesParamMixin):
    """Declares exactly Conv2d's parameter tree (HWIO kernel + bias, incl.
    the Bayesian variant) and returns the VALUES (see :class:`DenseParams`)."""

    in_features: int
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    groups: int = 1
    use_bias: bool = True
    kernel_init: Callable = inits.torch_default_kernel
    bias_init: Optional[Callable] = None
    bayesian: bool = False
    sigma_init: float = 0.05

    @nn.compact
    def __call__(self):
        kh, kw = _pair(self.kernel_size)
        kshape = (kh, kw, self.in_features // self.groups, self.features)
        fan_in = (self.in_features // self.groups) * kh * kw
        if self.bayesian:
            kernel = self._bayes_weight("kernel", self.kernel_init, kshape,
                                        self.sigma_init)
        else:
            kernel = self.param("kernel", self.kernel_init, kshape)
        bias = None
        if self.use_bias:
            b_init = self.bias_init or inits.torch_default_bias(fan_in)
            if self.bayesian:
                bias = self._bayes_weight("bias", b_init, (self.features,),
                                          self.sigma_init)
            else:
                bias = self.param("bias", b_init, (self.features,))
        return kernel, bias


class LayerNormParams(nn.Module):
    """Declares LayerNorm2d's (scale, bias) and returns the values (see
    :class:`DenseParams`)."""

    features: int
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        scale = (self.param("scale", inits.ones, (self.features,))
                 if self.use_scale else jnp.ones((self.features,), jnp.float32))
        bias = (self.param("bias", inits.zeros, (self.features,))
                if self.use_bias else jnp.zeros((self.features,), jnp.float32))
        return scale, bias


class PReLU(nn.Module):
    """Channel-shared PReLU (torch default: single learnable slope 0.25)."""

    init_slope: float = 0.25

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        a = self.param("slope", inits.constant(self.init_slope), (1,))
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


def pixel_shuffle_cf(x: jax.Array, factor: int) -> jax.Array:
    """(B, C*r^2, H, W) -> (B, C, H*r, W*r), torch PixelShuffle channel order."""
    B, C, H, W = x.shape
    r = factor
    c = C // (r * r)
    x = x.reshape(B, c, r, r, H, W)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(B, c, H * r, W * r)


def pixel_shuffle(x: jax.Array, factor: int) -> jax.Array:
    """(B, H, W, C*r^2) -> (B, H*r, W*r, C), torch PixelShuffle channel order."""
    B, H, W, C = x.shape
    r = factor
    c = C // (r * r)
    # torch layout: channels = c * r * r with (c, rh, rw) ordering
    x = x.reshape(B, H, W, c, r, r)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(B, H * r, W * r, c)


def pixel_unshuffle(x: jax.Array, factor: int) -> jax.Array:
    """(B, H*r, W*r, C) -> (B, H, W, C*r^2) inverse of pixel_shuffle."""
    B, H, W, C = x.shape
    r = factor
    x = x.reshape(B, H // r, r, W // r, r, C)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))
    return x.reshape(B, H // r, W // r, C * r * r)
