"""Mixup augmentation (reference: basicsr/utils/mixing_augment.py:3-30).

Device-side pure function variant: the reference's Mixing_Augment mixes the
batch with a flipped copy using a Beta(alpha, alpha) weight; use_identity
randomly skips the mix. (The reference's use_identity path references an
unimported ``random`` — a latent bug noted in SURVEY §2.2; here it's an rng
draw.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class MixingAugment:
    def __init__(self, mixup_beta: float = 1.2, use_identity: bool = False):
        self.mixup_beta = mixup_beta
        self.use_identity = use_identity

    def _mix(self, key, target, input_):
        lam = jax.random.beta(key, self.mixup_beta, self.mixup_beta)
        r_target = jnp.flip(target, axis=0)
        r_input = jnp.flip(input_, axis=0)
        return (
            lam * target + (1 - lam) * r_target,
            lam * input_ + (1 - lam) * r_input,
        )

    def __call__(self, key, target, input_):
        if self.use_identity:
            k1, k2 = jax.random.split(key)
            do_mix = jax.random.uniform(k1) < 0.5
            mixed = self._mix(k2, target, input_)
            return jax.tree.map(
                lambda m, o: jnp.where(do_mix, m, o), mixed, (target, input_)
            )
        return self._mix(key, target, input_)
