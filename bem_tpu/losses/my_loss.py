"""Ad-hoc combined losses (reference: basicsr/losses/my_loss.py, 73 LoC).

jnp ports of the reference's color / psnr / smooth-L1 / (MS-)SSIM /
histogram losses and the ``CombinedLoss`` aggregate. SSIM follows the
pytorch_msssim algorithm the reference imports (separable gaussian window
11 / sigma 1.5, VALID padding, K1=0.01, K2=0.03); MS-SSIM uses its default
5-level weights with 2x average-pool downsampling between levels — the
reference's ``power_factors`` argument is accepted-and-ignored exactly like
the reference's call signature (pytorch_msssim never receives it).

Images are NHWC float in [0, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.registry import LOSS_REGISTRY

_MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def color_loss(y_true, y_pred):
    """Mean abs difference of the per-image global means (my_loss.py:22)."""
    mt = jnp.mean(y_true, axis=(1, 2, 3))
    mp = jnp.mean(y_pred, axis=(1, 2, 3))
    return jnp.mean(jnp.abs(mt - mp))


def psnr_loss(y_true, y_pred):
    """40 - PSNR(mse) (my_loss.py:25)."""
    mse = jnp.mean(jnp.square(y_true - y_pred))
    psnr = 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))
    return 40.0 - psnr


def smooth_l1_loss(y_true, y_pred):
    """torch F.smooth_l1_loss, beta=1 (my_loss.py:30)."""
    d = jnp.abs(y_true - y_pred)
    return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))


def _gaussian_window(size=11, sigma=1.5):
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    return jnp.asarray((g / g.sum()).astype(np.float32))


def _filter2d_sep(x, win):
    """Separable per-channel VALID gaussian filter; x NHWC."""
    c = x.shape[-1]
    kh = jnp.tile(win.reshape(-1, 1, 1, 1), (1, 1, 1, c))  # (S,1,1,C)
    kw = jnp.tile(win.reshape(1, -1, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=dn, feature_group_count=c)
    return jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                        dimension_numbers=dn, feature_group_count=c)


def _ssim_per_channel(x, y, data_range=1.0, win_size=11, sigma=1.5):
    """(ssim, cs) per (batch, channel), pytorch_msssim._ssim semantics."""
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    win = _gaussian_window(win_size, sigma)
    mu1 = _filter2d_sep(x, win)
    mu2 = _filter2d_sep(y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d_sep(x * x, win) - mu1_sq
    sigma2_sq = _filter2d_sep(y * y, win) - mu2_sq
    sigma12 = _filter2d_sep(x * y, win) - mu1_mu2
    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return jnp.mean(ssim_map, axis=(1, 2)), jnp.mean(cs_map, axis=(1, 2))


def ssim(x, y, data_range=1.0, size_average=True):
    s, _ = _ssim_per_channel(x, y, data_range)
    return jnp.mean(s) if size_average else jnp.mean(s, axis=1)


def _avg_pool2(x):
    """torch avg_pool2d(kernel=2, padding=size%2, count_include_pad=True)."""
    ph, pw = x.shape[1] % 2, x.shape[2] % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


def ms_ssim(x, y, data_range=1.0, size_average=True, weights=_MS_WEIGHTS):
    levels = len(weights)
    w = jnp.asarray(weights, jnp.float32)
    mcs = []
    for i in range(levels):
        s, cs = _ssim_per_channel(x, y, data_range)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs))
            x, y = _avg_pool2(x), _avg_pool2(y)
    vals = jnp.stack(mcs + [jax.nn.relu(s)])          # (levels, B, C)
    out = jnp.prod(vals ** w[:, None, None], axis=0)  # (B, C)
    return jnp.mean(out) if size_average else jnp.mean(out, axis=1)


def ssim_loss(y_true, y_pred, max_val=1.0, power_factors=(0.5, 0.5)):
    return 1.0 - ssim(y_true, y_pred, data_range=max_val)


def multiscale_ssim_loss(y_true, y_pred, max_val=1.0, power_factors=(0.5, 0.5)):
    return 1.0 - ms_ssim(y_true, y_pred, data_range=max_val)


def histogram_loss(y_true, y_pred, bins=256):
    """Global-histogram L1 (my_loss.py:40-49). torch.histc carries no
    gradient; stop_gradient mirrors that."""
    def hist(v):
        h, _ = jnp.histogram(jax.lax.stop_gradient(v).reshape(-1),
                             bins=bins, range=(0.0, 1.0))
        h = h.astype(jnp.float32)
        return h / jnp.sum(h)
    return jnp.mean(jnp.abs(hist(y_true) - hist(y_pred)))


class VGGPerceptualLoss:
    """MSE between VGG19 features up to block3_conv3 (torchvision
    ``features[:16]`` ends at relu3_3; my_loss.py:9-19). Note: unlike the
    main PerceptualLoss, the reference applies NO input normalization here."""

    def __init__(self):
        from .perceptual import VGGFeatureExtractor

        self._extract = VGGFeatureExtractor(["conv3_3"], use_input_norm=False)

    def __call__(self, y_true, y_pred):
        # features[:16] ends with an nn.ReLU, so compare relu(conv3_3)
        ft = jax.nn.relu(self._extract(y_true)["conv3_3"])
        fp = jax.nn.relu(self._extract(y_pred)["conv3_3"])
        return jnp.mean(jnp.square(ft - fp))


@LOSS_REGISTRY.register()
class CombinedLoss:
    """Weighted sum of the six ad-hoc terms (my_loss.py:51-73)."""

    def __init__(self, loss_weight: float = 1.0):
        self.loss_weight = loss_weight
        self.perceptual = VGGPerceptualLoss()
        self.alpha1, self.alpha2, self.alpha3 = 1.00, 0.06, 0.05
        self.alpha4, self.alpha5, self.alpha6 = 0.5, 0.0083, 0.25

    def __call__(self, y_true, y_pred):
        total = (self.alpha1 * smooth_l1_loss(y_true, y_pred)
                 + self.alpha2 * self.perceptual(y_true, y_pred)
                 + self.alpha3 * histogram_loss(y_true, y_pred)
                 + self.alpha5 * psnr_loss(y_true, y_pred)
                 + self.alpha6 * color_loss(y_true, y_pred)
                 + self.alpha4 * ssim_loss(y_true, y_pred))
        return self.loss_weight * total
