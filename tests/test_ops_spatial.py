"""Cross-scan/merge, Haar wavelets, quaternion ops."""

import jax.numpy as jnp
import numpy as np
import pytest

from bem_tpu.ops.cross_scan import cross_scan, cross_merge
from bem_tpu.ops.wavelet import dwt2, iwt2
from bem_tpu.ops.quaternion import hamilton_product, rgb_to_quaternions


def test_cross_scan_directions(rng):
    x = rng.standard_normal((2, 3, 5, 4)).astype(np.float32)
    y = np.asarray(cross_scan(jnp.asarray(x)))
    B, H, W, C = x.shape
    row = x.reshape(B, H * W, C)
    col = x.transpose(0, 2, 1, 3).reshape(B, H * W, C)
    np.testing.assert_array_equal(y[:, 0], row)
    np.testing.assert_array_equal(y[:, 1], col)
    np.testing.assert_array_equal(y[:, 2], row[:, ::-1])
    np.testing.assert_array_equal(y[:, 3], col[:, ::-1])


@pytest.mark.parametrize("scans", [0, 1, 2])
def test_cross_merge_adjoint_of_scan(rng, scans):
    # cross_merge is the transpose of cross_scan: <scan(x), y> == <x, merge(y)>
    x = rng.standard_normal((1, 4, 6, 3)).astype(np.float32)
    y = rng.standard_normal((1, 4, 24, 3)).astype(np.float32)
    sx = np.asarray(cross_scan(jnp.asarray(x), scans=scans))
    my = np.asarray(cross_merge(jnp.asarray(y), 4, 6, scans=scans))
    np.testing.assert_allclose(np.sum(sx * y), np.sum(x * my), rtol=1e-4, atol=1e-5)


def test_dwt_iwt_roundtrip(rng):
    x = rng.standard_normal((2, 8, 12, 5)).astype(np.float32)
    w = dwt2(jnp.asarray(x))
    assert w.shape == (2, 4, 6, 20)
    back = np.asarray(iwt2(w))
    np.testing.assert_allclose(back, x, rtol=1e-5, atol=1e-6)


def test_dwt_constant_image_energy():
    # a constant image has only an LL band; Haar pair used here divides by 2
    # per level so LL of a constant c image is 2c (matches reference dwt_init,
    # model4.py:7-18: four c/2 terms summed)
    x = jnp.ones((1, 4, 4, 1))
    w = np.asarray(dwt2(x))
    np.testing.assert_allclose(w[..., 0], 2.0)
    np.testing.assert_allclose(w[..., 1:], 0.0)


def test_hamilton_product_identity_and_norm(rng):
    q = rng.standard_normal((1, 3, 3, 4)).astype(np.float32)
    e = np.zeros((1, 3, 3, 4), np.float32)
    e[..., 0] = 1.0
    out = np.asarray(hamilton_product(jnp.asarray(e), jnp.asarray(q)))
    np.testing.assert_allclose(out, q, rtol=1e-6)
    # |q1 ⊗ q2| = |q1| |q2|
    q2 = rng.standard_normal((1, 3, 3, 4)).astype(np.float32)
    prod = np.asarray(hamilton_product(jnp.asarray(q), jnp.asarray(q2)))
    np.testing.assert_allclose(
        np.linalg.norm(prod, axis=-1),
        np.linalg.norm(q, axis=-1) * np.linalg.norm(q2, axis=-1),
        rtol=1e-5,
    )


def test_rgb_to_quaternions_layout(rng):
    img = rng.random((1, 2, 2, 3)).astype(np.float32)
    enc = np.asarray(rgb_to_quaternions(jnp.asarray(img)))
    assert enc.shape == (1, 2, 2, 8)
    m = img.max(axis=-1)
    np.testing.assert_allclose(enc[..., 0], 0.0)  # q1_r
    np.testing.assert_allclose(enc[..., 1], 0.0)  # q2_r
    np.testing.assert_allclose(enc[..., 3], img[..., 0], rtol=1e-6)  # q2_i = R
    np.testing.assert_allclose(
        enc[..., 2], img[..., 0] / (m + 1e-7), rtol=1e-5
    )  # q1_i = R/max
