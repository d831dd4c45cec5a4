"""Differentiable JPEG vs the real cv2 codec."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from bem_tpu.utils.diffjpeg import diff_jpeg, quality_to_factor


def _psnr(a, b):
    return 10 * np.log10(1.0 / np.mean((a - b) ** 2))


def test_diffjpeg_tracks_real_jpeg(rng):
    from scipy.ndimage import gaussian_filter

    img = gaussian_filter(rng.random((64, 64, 3)), 2.0)
    img = ((img - img.min()) / (img.max() - img.min())).astype(np.float32)
    out = np.asarray(diff_jpeg(jnp.asarray(img[None]), quality=50))[0]
    _, enc = cv2.imencode(".jpg", (img[..., ::-1] * 255).astype(np.uint8),
                          [int(cv2.IMWRITE_JPEG_QUALITY), 50])
    ref = cv2.imdecode(enc, 1)[..., ::-1].astype(np.float32) / 255.0
    # differentiable codec lands close to the real one
    assert _psnr(out, ref) > 32
    # distortion magnitude comparable to real JPEG at the same quality
    assert abs(_psnr(out, img) - _psnr(ref, img)) < 4


def test_diffjpeg_gradients_and_quality_monotonic(rng):
    img = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    g = jax.grad(lambda x: jnp.sum(diff_jpeg(x, 50)))(img)
    assert np.isfinite(np.asarray(g)).all()
    mse90 = float(jnp.mean((diff_jpeg(img, 90) - img) ** 2))
    mse10 = float(jnp.mean((diff_jpeg(img, 10) - img) ** 2))
    assert mse10 > mse90
    assert quality_to_factor(50) == pytest.approx(1.0)
    assert quality_to_factor(10) == pytest.approx(5.0)
