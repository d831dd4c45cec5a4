"""Quaternion ops for the QD Retinex decomposition, channels-last.

Equivalent of basicsr/QD/quaternion.py:3-17 (Hamilton product) and the
RGB -> (Q1, Q2) encoding shared by all QD models (e.g. model4.py:215-232).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hamilton_product(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product of quaternion maps, (B, H, W, 4) channels-last."""
    r1, i1, j1, k1 = jnp.split(q1, 4, axis=-1)
    r2, i2, j2, k2 = jnp.split(q2, 4, axis=-1)
    r = r1 * r2 - i1 * i2 - j1 * j2 - k1 * k2
    i = r1 * i2 + i1 * r2 + j1 * k2 - k1 * j2
    j = r1 * j2 - i1 * k2 + j1 * r2 + k1 * i2
    k = r1 * k2 + i1 * j2 - j1 * i2 + k1 * r2
    return jnp.concatenate([r, i, j, k], axis=-1)


def rgb_to_quaternions(img: jax.Array, eps: float = 1e-7):
    """RGB (B, H, W, 3) -> interleaved 8-channel quaternion encoding.

    Q1 = (0, R/max, G/max, B/max) chromaticity-like, Q2 = (0, R, G, B);
    channel order interleaves the two: (q1_r, q2_r, q1_i, q2_i, ...), matching
    the reference's cat order (model4.py:229-232).
    """
    r = img[..., 0:1]
    g = img[..., 1:2]
    b = img[..., 2:3]
    m = jnp.max(img, axis=-1, keepdims=True)
    zero = jnp.zeros_like(m)
    q1 = (zero, r / (m + eps), g / (m + eps), b / (m + eps))
    q2 = (zero, r, g, b)
    parts = []
    for c1, c2 in zip(q1, q2):
        parts.extend([c1, c2])
    return jnp.concatenate(parts, axis=-1)
