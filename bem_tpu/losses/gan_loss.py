"""GAN losses (reference: basicsr/losses/gan_loss.py:10-207).

Unused by BEM configs but part of the framework surface (BasicSR parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.registry import LOSS_REGISTRY


@LOSS_REGISTRY.register()
class GANLoss:
    def __init__(
        self,
        gan_type: str = "vanilla",
        real_label_val: float = 1.0,
        fake_label_val: float = 0.0,
        loss_weight: float = 1.0,
    ):
        self.gan_type = gan_type
        self.real_label_val = real_label_val
        self.fake_label_val = fake_label_val
        self.loss_weight = loss_weight
        if gan_type not in ("vanilla", "lsgan", "wgan", "wgan_softplus", "hinge"):
            raise NotImplementedError(f"GAN type {gan_type} not implemented")

    def _target(self, x, target_is_real):
        val = self.real_label_val if target_is_real else self.fake_label_val
        return jnp.full_like(x, val)

    def __call__(self, x, target_is_real: bool, is_disc: bool = False):
        t = self.gan_type
        if t == "vanilla":
            tgt = self._target(x, target_is_real)
            loss = jnp.mean(
                jnp.maximum(x, 0) - x * tgt + jnp.log1p(jnp.exp(-jnp.abs(x)))
            )
        elif t == "lsgan":
            tgt = self._target(x, target_is_real)
            loss = jnp.mean(jnp.square(x - tgt))
        elif t == "wgan":
            loss = -jnp.mean(x) if target_is_real else jnp.mean(x)
        elif t == "wgan_softplus":
            loss = jnp.mean(jax.nn.softplus(-x)) if target_is_real else jnp.mean(
                jax.nn.softplus(x)
            )
        elif t == "hinge":
            if is_disc:
                x = -x if target_is_real else x
                loss = jnp.mean(jax.nn.relu(1.0 + x))
            else:
                loss = -jnp.mean(x)
        return loss if is_disc else loss * self.loss_weight


@LOSS_REGISTRY.register()
class MultiScaleGANLoss(GANLoss):
    def __call__(self, x, target_is_real: bool, is_disc: bool = False):
        if isinstance(x, (list, tuple)):
            total = 0.0
            for xi in x:
                if isinstance(xi, (list, tuple)):
                    xi = xi[-1]
                total = total + super().__call__(xi, target_is_real, is_disc)
            return total / len(x)
        return super().__call__(x, target_is_real, is_disc)


def r1_penalty(real_grad: jax.Array) -> jax.Array:
    """R1 gradient penalty given d(real_pred)/d(real_img) (gan_loss.py:143)."""
    return jnp.mean(jnp.sum(jnp.square(real_grad), axis=(1, 2, 3)))


def gradient_penalty_loss(interp_grad: jax.Array, weight=None) -> jax.Array:
    if weight is not None:
        interp_grad = interp_grad * weight
    norm = jnp.sqrt(jnp.sum(jnp.square(interp_grad), axis=(1, 2, 3)) + 1e-12)
    return jnp.mean(jnp.square(norm - 1.0))
