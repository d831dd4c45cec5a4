"""On-device NIQE (metrics/niqe_jax.py) vs the numpy golden port.

The numpy port is itself golden-tested against the reference
basicsr/metrics/niqe.py (tests/test_metrics.py), so matching it transfers.
fp32-vs-fp64 differences enter through the hard AGGD table argmin and the
36x36 Mahalanobis solve; tolerance is absolute on the final score, plus a
ranking check over a candidate batch (what the K-sample selection uses).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def _images(rng, H, W):
    imgs = []
    base = rng.random((H // 8, W // 8, 3))
    a = np.kron(base, np.ones((8, 8, 1)))[:H, :W] * 0.7
    a = a + 0.3 * rng.random((H, W, 3))
    imgs.append(np.clip(a, 0, 1))                      # structured
    imgs.append(rng.random((H, W, 3)) * 0.9)           # dense noise
    imgs.append((rng.random((H, W, 3)) * 0.12) ** 1.5)  # dark / low-light
    blur = np.kron(rng.random((H // 16, W // 16, 3)),
                   np.ones((16, 16, 1)))[:H, :W]
    imgs.append(np.clip(0.8 * blur + 0.05 * rng.random((H, W, 3)), 0, 1))
    return np.stack(imgs).astype(np.float32)


def test_niqe_jax_matches_numpy(rng):
    from bem_tpu.metrics.niqe import calculate_niqe
    from bem_tpu.metrics.niqe_jax import niqe_batch_rgb

    H, W = 208, 304  # >= 2 blocks per axis, small enough for CPU
    imgs = _images(rng, H, W)
    fn = jax.jit(niqe_batch_rgb(H, W, round_rgb=True))
    got = np.asarray(fn(jnp.asarray(imgs)))

    refs = []
    for im in imgs:
        bgr = (im[..., ::-1] * 255.0).round().astype(np.float32)
        refs.append(
            calculate_niqe(bgr, crop_border=0, input_order="HWC", convert_to="y")
        )
    refs = np.asarray(refs)

    assert np.all(np.abs(got - refs) < 0.25), (got, refs)
    # ranking must match: that is what candidate selection consumes
    assert list(np.argsort(got)) == list(np.argsort(refs)), (got, refs)


def test_niqe_jax_batch_is_vmappable(rng):
    """The scorer must be one compiled program over the K batch."""
    from bem_tpu.metrics.niqe_jax import niqe_batch_rgb

    H, W = 112, 112
    imgs = jnp.asarray(rng.random((3, H, W, 3)).astype(np.float32))
    out = jax.jit(niqe_batch_rgb(H, W))(imgs)
    assert out.shape == (3,)
    assert bool(jnp.all(jnp.isfinite(out)))
