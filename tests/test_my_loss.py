"""Ad-hoc my_loss ports vs torch oracles (reference basicsr/losses/my_loss.py).

The (MS-)SSIM oracle reimplements the pytorch_msssim algorithm the reference
imports (gaussian 11/1.5 separable VALID filter, K1=.01/K2=.03, 5-level
avg-pool MS weights) in torch, since pytorch_msssim itself is not installed.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from bem_tpu.losses import my_loss  # noqa: E402


def _t(x):  # NHWC numpy -> NCHW torch
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def _gauss_win(size=11, sigma=1.5):
    coords = torch.arange(size, dtype=torch.float64) - size // 2
    g = torch.exp(-(coords**2) / (2 * sigma**2))
    return (g / g.sum()).float()


def _torch_filter(x, win):
    c = x.shape[1]
    out = F.conv2d(x, win.reshape(1, 1, -1, 1).repeat(c, 1, 1, 1), groups=c)
    return F.conv2d(out, win.reshape(1, 1, 1, -1).repeat(c, 1, 1, 1), groups=c)


def _torch_ssim(x, y, data_range=1.0):
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    win = _gauss_win()
    mu1, mu2 = _torch_filter(x, win), _torch_filter(y, win)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _torch_filter(x * x, win) - mu1_sq
    s2 = _torch_filter(y * y, win) - mu2_sq
    s12 = _torch_filter(x * y, win) - mu12
    cs_map = (2 * s12 + c2) / (s1 + s2 + c2)
    ssim_map = ((2 * mu12 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return ssim_map.mean(dim=(2, 3)), cs_map.mean(dim=(2, 3))


def _torch_ms_ssim(x, y, data_range=1.0,
                   weights=(0.0448, 0.2856, 0.3001, 0.2363, 0.1333)):
    w = torch.tensor(weights)
    mcs = []
    for i in range(len(weights)):
        s, cs = _torch_ssim(x, y, data_range)
        if i < len(weights) - 1:
            mcs.append(torch.relu(cs))
            pad = [d % 2 for d in x.shape[2:]]
            x = F.avg_pool2d(x, kernel_size=2, padding=pad)
            y = F.avg_pool2d(y, kernel_size=2, padding=pad)
    vals = torch.stack(mcs + [torch.relu(s)])
    return (vals ** w.view(-1, 1, 1)).prod(dim=0).mean()


@pytest.fixture()
def pair():
    rng = np.random.default_rng(0)
    a = rng.random((2, 64, 80, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    return a, b


def test_simple_losses_match_torch(pair):
    a, b = pair
    ta, tb = _t(a), _t(b)
    np.testing.assert_allclose(
        float(my_loss.color_loss(jnp.asarray(a), jnp.asarray(b))),
        float(torch.mean(torch.abs(ta.mean(dim=(1, 2, 3)) - tb.mean(dim=(1, 2, 3))))),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        float(my_loss.psnr_loss(jnp.asarray(a), jnp.asarray(b))),
        float(40.0 - 20 * torch.log10(1.0 / torch.sqrt(F.mse_loss(ta, tb)))),
        rtol=1e-5)
    np.testing.assert_allclose(
        float(my_loss.smooth_l1_loss(jnp.asarray(a), jnp.asarray(b))),
        float(F.smooth_l1_loss(ta, tb)), rtol=1e-5)


def test_ssim_matches_pytorch_msssim_algorithm(pair):
    a, b = pair
    s_ref, _ = _torch_ssim(_t(a), _t(b))
    np.testing.assert_allclose(
        float(my_loss.ssim(jnp.asarray(a), jnp.asarray(b))),
        float(s_ref.mean()), rtol=1e-4)
    np.testing.assert_allclose(
        float(my_loss.ssim_loss(jnp.asarray(a), jnp.asarray(b))),
        float(1.0 - s_ref.mean()), rtol=1e-3, atol=1e-6)


def test_ms_ssim_matches_pytorch_msssim_algorithm():
    rng = np.random.default_rng(1)
    # >= 161 px so 5 levels stay above the 11-tap window
    a = rng.random((1, 176, 192, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.03, a.shape), 0, 1).astype(np.float32)
    ref = _torch_ms_ssim(_t(a), _t(b))
    np.testing.assert_allclose(
        float(my_loss.ms_ssim(jnp.asarray(a), jnp.asarray(b))),
        float(ref), rtol=1e-4)


def test_histogram_loss_matches_torch(pair):
    a, b = pair
    ha = torch.histc(_t(a), bins=256, min=0.0, max=1.0)
    hb = torch.histc(_t(b), bins=256, min=0.0, max=1.0)
    ref = torch.mean(torch.abs(ha / ha.sum() - hb / hb.sum()))
    np.testing.assert_allclose(
        float(my_loss.histogram_loss(jnp.asarray(a), jnp.asarray(b))),
        float(ref), rtol=1e-4, atol=1e-8)


def test_combined_loss_composition(pair, monkeypatch):
    """CombinedLoss = exact alpha-weighted sum (VGG term stubbed: weights
    are egress-gated; composition is what's under test here)."""
    a, b = pair
    monkeypatch.setattr(
        my_loss, "VGGPerceptualLoss",
        lambda: (lambda yt, yp: jnp.float32(0.123)))
    cl = my_loss.CombinedLoss()
    got = float(cl(jnp.asarray(a), jnp.asarray(b)))
    exp = (1.00 * float(my_loss.smooth_l1_loss(jnp.asarray(a), jnp.asarray(b)))
           + 0.06 * 0.123
           + 0.05 * float(my_loss.histogram_loss(jnp.asarray(a), jnp.asarray(b)))
           + 0.0083 * float(my_loss.psnr_loss(jnp.asarray(a), jnp.asarray(b)))
           + 0.25 * float(my_loss.color_loss(jnp.asarray(a), jnp.asarray(b)))
           + 0.5 * float(my_loss.ssim_loss(jnp.asarray(a), jnp.asarray(b))))
    np.testing.assert_allclose(got, exp, rtol=1e-5)
