"""Metric self-tests + golden parity vs the reference implementations.

Pattern follows the reference's metric self-test
(basicsr/metrics/test_metrics/test_psnr_ssim.py) plus cross-checks against
the reference code run on the same fixtures (skipped without the snapshot).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

from bem_tpu.metrics import (
    calculate_niqe,
    calculate_psnr,
    calculate_ssim,
    calculate_psnr_jax,
    calculate_ssim_jax,
    getUCIQE,
    getUIQM,
)

REF = "/root/reference"
HAS_REF = os.path.isdir(REF)


def fixture_images(seed=0, h=128, w=160):
    rng = np.random.default_rng(seed)
    base = rng.random((h, w, 3))
    # smooth it so metrics see natural-ish structure
    k = np.ones((5, 5)) / 25.0
    from scipy.ndimage import convolve

    img = np.stack([convolve(base[..., c], k) for c in range(3)], -1)
    img2 = np.clip(img + 0.05 * rng.standard_normal(img.shape), 0, 1)
    return (img * 255).round().astype(np.uint8), (img2 * 255).round().astype(np.uint8)


def test_psnr_ssim_basic():
    img, img2 = fixture_images()
    psnr = calculate_psnr(img, img2, crop_border=0)
    ssim = calculate_ssim(img, img2, crop_border=0)
    assert 20 < psnr < 40
    assert 0.3 < ssim < 1.0
    assert calculate_psnr(img, img, crop_border=0) == float("inf")
    assert calculate_ssim(img, img, crop_border=0) == pytest.approx(1.0, abs=1e-6)


def test_psnr_ssim_jax_matches_numpy():
    import jax.numpy as jnp

    img, img2 = fixture_images()
    a = jnp.asarray(img[None].astype(np.float32) / 255.0)
    b = jnp.asarray(img2[None].astype(np.float32) / 255.0)
    psnr_np = calculate_psnr(img, img2, crop_border=0)
    ssim_np = calculate_ssim(img, img2, crop_border=0)
    psnr_j = float(calculate_psnr_jax(a, b)[0])
    ssim_j = float(calculate_ssim_jax(a, b)[0])
    assert abs(psnr_np - psnr_j) < 0.05
    assert abs(ssim_np - ssim_j) < 1e-3


@pytest.mark.skipif(not HAS_REF, reason="reference snapshot unavailable")
def test_psnr_ssim_match_reference():
    from ref_loader import load_ref_metric_modules

    mods = load_ref_metric_modules()
    ref_psnr = mods["psnr_ssim"].calculate_psnr
    ref_ssim = mods["psnr_ssim"].calculate_ssim
    img, img2 = fixture_images()
    assert calculate_psnr(img, img2, 0) == pytest.approx(ref_psnr(img, img2, 0), abs=1e-8)
    assert calculate_ssim(img, img2, 0) == pytest.approx(ref_ssim(img, img2, 0), abs=1e-8)
    assert calculate_psnr(img, img2, 0, test_y_channel=True) == pytest.approx(
        ref_psnr(img, img2, 0, test_y_channel=True), abs=1e-5
    )
    assert calculate_ssim(img, img2, 0, test_y_channel=True) == pytest.approx(
        ref_ssim(img, img2, 0, test_y_channel=True), abs=1e-6
    )


@pytest.mark.skipif(not HAS_REF, reason="reference snapshot unavailable")
def test_niqe_matches_reference():
    from ref_loader import load_ref_metric_modules

    ref_niqe = load_ref_metric_modules()["niqe"].calculate_niqe
    img, _ = fixture_images(h=200, w=200)
    ours = calculate_niqe(img, crop_border=0)
    theirs = ref_niqe(img, crop_border=0)
    assert ours == pytest.approx(theirs, rel=1e-3)


@pytest.mark.skipif(not HAS_REF, reason="reference snapshot unavailable")
def test_uciqe_uiqm_match_reference():
    from ref_loader import load_ref_metric_modules

    mods = load_ref_metric_modules()
    ref_uciqe = mods["uciqe_uiqm"].getUCIQE
    ref_uiqm = mods["uciqe_uiqm"].getUIQM
    img, _ = fixture_images(h=120, w=140)
    assert getUCIQE(img) == pytest.approx(ref_uciqe(img), rel=1e-5)
    assert getUIQM(img) == pytest.approx(ref_uiqm(img), rel=1e-4)
