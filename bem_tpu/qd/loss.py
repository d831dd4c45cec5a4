"""QD Retinex decomposition losses.

Parity: basicsr/QD/loss.py:6-95 (RetinexLoss) plus the train2.py extensions
(total_variation_loss :30-33, frequency_regularization :19-28 and the
rebalanced weights :103-110). Channels-last.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.quaternion import hamilton_product

_GRAY = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)


def _gradient(x: jax.Array, direction: str) -> jax.Array:
    """|conv2d(x, 2x2 smooth kernel, padding=1)| on a 1-channel map.

    Matches the reference's odd padding choice (loss.py:19): output is
    (H+1, W+1) — the mean reduction downstream makes that benign.
    """
    if direction == "x":
        k = jnp.asarray([[0, 0], [-1, 1]], jnp.float32)
    else:
        k = jnp.asarray([[0, -1], [0, 1]], jnp.float32)
    kern = k[:, :, None, None]  # HWIO
    y = jax.lax.conv_general_dilated(
        x, kern, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jnp.abs(y)


def _avg_pool3(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), ((0, 0), (1, 1), (1, 1), (0, 0))
    ) / 9.0


def _gray(x: jax.Array) -> jax.Array:
    return jnp.sum(x * _GRAY, axis=-1, keepdims=True)


def smoothness(I: jax.Array, R: jax.Array) -> jax.Array:
    """Illumination smoothness weighted by exp(-10 * avg reflectance grad)
    (loss.py:25-39)."""
    Rg, Ig = _gray(R), _gray(I)
    return jnp.mean(
        _gradient(Ig, "x") * jnp.exp(-10.0 * _avg_pool3(_gradient(Rg, "x")))
        + _gradient(Ig, "y") * jnp.exp(-10.0 * _avg_pool3(_gradient(Rg, "y")))
    )


def total_variation_loss(img: jax.Array, weight: float = 0.1) -> jax.Array:
    """(train2.py:30-33), NHWC."""
    tv_h = jnp.mean(jnp.abs(img[:, 1:, :, :] - img[:, :-1, :, :]))
    tv_w = jnp.mean(jnp.abs(img[:, :, 1:, :] - img[:, :, :-1, :]))
    return weight * (tv_h + tv_w)


def frequency_regularization(img: jax.Array, weight: float = 0.01) -> jax.Array:
    """High-frequency FFT penalty (train2.py:19-28), NHWC -> fft over H, W."""
    fft = jnp.fft.fft2(img.astype(jnp.float32), axes=(1, 2), norm="ortho")
    fft = jnp.fft.fftshift(fft, axes=(1, 2))
    return weight * jnp.mean(jnp.abs(fft[:, -10:, -10:, :]))


class RetinexLoss:
    """RetinexNet-style decomposition loss on quaternion pairs (loss.py:41-95).

    extended=True adds the train2.py TV + FFT terms with its weights
    (train2.py:103-110); extended=False reproduces loss.py:78-84.
    """

    def __init__(self, extended: bool = False):
        self.extended = extended

    def __call__(self, Q1_low, Q2_low, input_low, Q1_high, Q2_high, input_high):
        R_low, I_low = Q1_low[..., 1:], Q2_low[..., 1:]
        R_high, I_high = Q1_high[..., 1:], Q2_high[..., 1:]

        recon_low = hamilton_product(Q1_low, Q2_low)[..., 1:]
        recon_high = hamilton_product(Q1_high, Q2_high)[..., 1:]
        recon_mutal_low = hamilton_product(Q1_high, Q2_low)[..., 1:]
        recon_mutal_high = hamilton_product(Q1_low, Q2_high)[..., 1:]

        l1 = lambda a, b: jnp.mean(jnp.abs(a - b))
        recon_loss_low = l1(recon_low, input_low)
        recon_loss_high = l1(recon_high, input_high)
        recon_loss_mutal_low = l1(recon_mutal_low, input_low)
        recon_loss_mutal_high = l1(recon_mutal_high, input_high)
        equal_R_loss = l1(R_low, jax.lax.stop_gradient(R_high))

        out = {
            "recon_loss_low": recon_loss_low,
            "recon_loss_high": recon_loss_high,
            "recon_loss_mutal_low": recon_loss_mutal_low,
            "recon_loss_mutal_high": recon_loss_mutal_high,
            "equal_R_loss": equal_R_loss,
        }
        if self.extended:
            Ismooth_loss_low = smoothness(I_low, R_low) + total_variation_loss(R_low)
            Ismooth_loss_high = smoothness(I_high, R_high) + total_variation_loss(R_high)
            freq_loss = frequency_regularization(recon_low) + frequency_regularization(recon_high)
            loss = (
                recon_loss_low + recon_loss_high
                + 0.01 * recon_loss_mutal_low + 0.01 * recon_loss_mutal_high
                + 0.05 * Ismooth_loss_low + 0.05 * Ismooth_loss_high
                + 0.01 * equal_R_loss + freq_loss
            )
            out["freq_loss"] = freq_loss
        else:
            Ismooth_loss_low = smoothness(I_low, R_low)
            Ismooth_loss_high = smoothness(I_high, R_high)
            loss = (
                recon_loss_low + recon_loss_high
                + 0.001 * recon_loss_mutal_low + 0.001 * recon_loss_mutal_high
                + 0.1 * Ismooth_loss_low + 0.1 * Ismooth_loss_high
                + 0.01 * equal_R_loss
            )
        out["Ismooth_loss_low"] = Ismooth_loss_low
        out["Ismooth_loss_high"] = Ismooth_loss_high
        out["loss_Decom"] = loss
        return out

    def recon_only(self, Q1_low, Q2_low, input_low, Q1_high, Q2_high, input_high):
        """Warmup objective: reconstruction terms only (train2.py:258-261)."""
        l1 = lambda a, b: jnp.mean(jnp.abs(a - b))
        recon_low = hamilton_product(Q1_low, Q2_low)[..., 1:]
        recon_high = hamilton_product(Q1_high, Q2_high)[..., 1:]
        return l1(recon_low, input_low) + l1(recon_high, input_high)
