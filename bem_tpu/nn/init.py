"""Initializers matching the reference's torch init distributions.

The reference relies on torch defaults (kaiming-uniform with a=sqrt(5) for
convs/linears), explicit kaiming_normal for stem convs (UNet_arch.py:406-408),
trunc_normal(0.02) for linears inside subnetworks (UNet_arch.py:335-342), and
the mamba dt/A/D initialization (vmamba.py:222-289). Distributional parity —
not bitwise parity — is the goal: training dynamics match.

All kernel shapes here are HWIO (convs) or (in, out) (dense); fan counts are
computed accordingly so they equal torch's OIHW fans.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _conv_fans(shape):
    """HWIO kernel -> (fan_in, fan_out). For dense (in, out) kernels too."""
    if len(shape) == 2:
        return shape[0], shape[1]
    receptive = math.prod(shape[:-2])
    return shape[-2] * receptive, shape[-1] * receptive


def torch_default_kernel(key, shape, dtype=jnp.float32):
    """torch's Conv2d/Linear default: kaiming_uniform(a=sqrt(5)).

    bound = gain * sqrt(3/fan_in) with gain = sqrt(2/(1+5)) = sqrt(1/3),
    i.e. exactly U(+-1/sqrt(fan_in)). (A stray sqrt(3) factor here made
    every default-initialized kernel sqrt(3) too wide until round 2 — the
    converted-checkpoint parity tests could not see it; the QD convergence
    comparison did: 4x higher initial loss, 8 dB worse converged recon.)"""
    fan_in, _ = _conv_fans(shape)
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_default_bias(fan_in):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_normal(mode="fan_in", nonlinearity="leaky_relu", a=0.0):
    """torch.nn.init.kaiming_normal_ equivalent for HWIO kernels."""
    if nonlinearity == "relu":
        gain = math.sqrt(2.0)
    elif nonlinearity == "leaky_relu":
        gain = math.sqrt(2.0 / (1 + a**2))
    elif nonlinearity == "linear":
        gain = 1.0
    else:
        raise ValueError(nonlinearity)

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _conv_fans(shape)
        fan = fan_in if mode == "fan_in" else fan_out
        std = gain / math.sqrt(fan)
        return std * jax.random.normal(key, shape, dtype)

    return init


def kaiming_uniform(mode="fan_in", nonlinearity="relu", a=0.0):
    """torch.nn.init.kaiming_uniform_ equivalent for HWIO kernels."""
    if nonlinearity == "relu":
        gain = math.sqrt(2.0)
    elif nonlinearity == "leaky_relu":
        gain = math.sqrt(2.0 / (1 + a**2))
    elif nonlinearity == "linear":
        gain = 1.0
    else:
        raise ValueError(nonlinearity)

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _conv_fans(shape)
        fan = fan_in if mode == "fan_in" else fan_out
        bound = gain * math.sqrt(3.0 / fan)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def trunc_normal(std=0.02, mean=0.0, a=-2.0, b=2.0):
    """trunc_normal_ (timm semantics: a/b are absolute bounds)."""

    def init(key, shape, dtype=jnp.float32):
        lo = (a - mean) / std
        hi = (b - mean) / std
        return mean + std * jax.random.truncated_normal(key, lo, hi, shape, dtype)

    return init


def constant(value):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init


def zeros(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


# --------------------------------------------------------------------------
# mamba-specific initializers (vmamba.py:222-289)
# --------------------------------------------------------------------------


def dt_proj_weight_init(dt_rank, dt_scale=1.0, dt_init="random"):
    """dt projection weight init: U(±dt_rank^-0.5 * scale) or constant."""
    std = dt_rank**-0.5 * dt_scale

    def init(key, shape, dtype=jnp.float32):
        if dt_init == "constant":
            return jnp.full(shape, std, dtype)
        return jax.random.uniform(key, shape, dtype, -std, std)

    return init


def dt_proj_bias_init(dt_min=0.001, dt_max=0.1, dt_init_floor=1e-4):
    """Bias s.t. softplus(bias) ~ LogUniform(dt_min, dt_max) (vmamba.py:236-244)."""

    def init(key, shape, dtype=jnp.float32):
        u = jax.random.uniform(key, shape, jnp.float32)
        dt = jnp.exp(u * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
        dt = jnp.clip(dt, min=dt_init_floor)
        # inverse softplus
        inv = dt + jnp.log(-jnp.expm1(-dt))
        return inv.astype(dtype)

    return init


def a_log_init(d_state):
    """S4D-real init: A_log = log(1..N) per channel (vmamba.py:250-261)."""

    def init(key, shape, dtype=jnp.float32):
        # shape (..., d_state)
        a = jnp.arange(1, d_state + 1, dtype=jnp.float32)
        return jnp.broadcast_to(jnp.log(a), shape).astype(dtype)

    return init
