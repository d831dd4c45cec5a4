"""Functional Bayesian-NN utilities over (params, bayes_prior) trees.

The reference mutates per-layer state inside every stochastic forward
(basicsr/bayesian/conv.py:91-110: EMA prior update under no_grad, then weight
sampling) and sums ``layer.kl_loss()`` over modules (tools.py:76-84). Here the
same semantics are pure tree ops, applied once per train step:

- layers declare (mu_*, rho_*) params and a ``bayes_prior`` collection with
  identically-named leaves (see bem_tpu.nn.layers);
- :func:`update_prior_ema` advances the prior toward the posterior with the
  thresholded decay ``min(decay, (1+step)/(10+step))`` (conv.py:94);
- :func:`get_kl_loss` computes ``KL(N(mu,σ) || N(mu_p,σ_p)).mean()`` per
  (weight|bias) tensor and sums over layers (base_layer.py:26-39, conv.py:85-89);
- sampling itself happens inside the layers via the ``bayes`` rng stream;
  K-sample inference = ``jax.vmap`` over :func:`sample_rngs`.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import traverse_util

from ..nn.layers import softplus_sigma


def _flat(tree) -> Dict[tuple, jax.Array]:
    return traverse_util.flatten_dict(tree)


def extract_bayes_prior(params: Any) -> Any:
    """Initial prior = copy of the posterior's (mu_*, rho_*) leaves
    (conv.py:77-78: prior init copies the posterior init). Returns None when
    the network has no Bayesian layers."""
    flat = {k: jnp.asarray(v) for k, v in _flat(params).items()
            if k[-1].startswith(("mu_", "rho_"))}
    if not flat:
        return None
    return traverse_util.unflatten_dict(flat)


def update_prior_ema(prior: Any, params: Any, step: jax.Array, decay: float = 0.9998) -> Any:
    """EMA-update every prior leaf toward its posterior param (conv.py:91-104).

    `step` counts stochastic training forwards so far (0-based, like the
    reference's per-layer ``self.step`` at the time of the update).
    """
    _decay = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
    pflat = _flat(params)
    new_prior = {
        k: _decay * v + (1.0 - _decay) * pflat[k] for k, v in _flat(prior).items()
    }
    return traverse_util.unflatten_dict(new_prior)


def get_kl_loss(params: Any, prior: Any) -> jax.Array:
    """Sum over layers of mean-elementwise KL(posterior || EMA prior)."""
    pflat = _flat(params)
    prflat = _flat(prior)
    total = jnp.float32(0.0)
    for key, prior_mu in prflat.items():
        if key[-1].startswith("mu_"):
            suffix = key[-1][3:]
            rho_key = key[:-1] + (f"rho_{suffix}",)
            mu_q = pflat[key]
            sigma_q = softplus_sigma(pflat[rho_key])
            mu_p = prior_mu
            sigma_p = softplus_sigma(prflat[rho_key])
            kl = (
                jnp.log(sigma_p)
                - jnp.log(sigma_q)
                + (sigma_q**2 + (mu_q - mu_p) ** 2) / (2.0 * sigma_p**2)
                - 0.5
            )
            total = total + jnp.mean(kl)
    return total


def sample_rngs(key: jax.Array, k: int) -> jax.Array:
    """K independent 'bayes' rng keys for vmapped K-sample inference."""
    return jax.random.split(key, k)


def count_bayesian_params(params: Any) -> int:
    """Number of (mu, rho) weight tensors — sanity/telemetry helper."""
    return sum(1 for k in _flat(params) if k[-1].startswith("mu_"))
