"""Legacy op equivalents: fused_act, upfirdn2d, deformable conv, VSSM."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bem_tpu.ops.legacy import (
    fused_leaky_relu,
    upfirdn2d,
    make_resample_kernel,
    modulated_deform_conv2d,
)


def test_fused_leaky_relu(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 8)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
    y = np.asarray(fused_leaky_relu(x, b))
    ref = np.asarray(x) + np.asarray(b)
    ref = np.where(ref >= 0, ref, 0.2 * ref) * 2**0.5
    np.testing.assert_allclose(y, ref, rtol=1e-6)


def test_upfirdn2d_identity(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)).astype(np.float32))
    k = jnp.asarray([[1.0]])
    y = upfirdn2d(x, k, up=1, down=1, pad=(0, 0))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-6)


def test_upfirdn2d_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 6, 6, 2)).astype(np.float32)
    k1 = np.asarray([1.0, 3.0, 3.0, 1.0], np.float32)
    k = np.asarray(make_resample_kernel(k1))

    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), up=2, down=1,
                               pad=(1, 1)))

    # torch oracle: zero-stuff upsample, pad, conv2d with flipped kernel
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    B, C, H, W = xt.shape
    up = torch.zeros(B, C, H, 2, W, 2)
    up[:, :, :, 0, :, 0] = xt
    up = up.reshape(B, C, H * 2, W * 2)
    up = F.pad(up, (1, 1, 1, 1))
    kt = torch.from_numpy(np.ascontiguousarray(k[::-1, ::-1])).reshape(1, 1, 4, 4)
    kt = kt.expand(C, 1, 4, 4)
    ref = F.conv2d(up, kt, groups=C).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_modulated_deform_conv_zero_offset_equals_conv(rng):
    """With zero offsets and unit mask, DCNv2 == plain conv."""
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 6)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 4)).astype(np.float32) * 0.1)
    offset = jnp.zeros((2, 8, 8, 2 * 9))
    mask = jnp.ones((2, 8, 8, 9))
    got = np.asarray(modulated_deform_conv2d(x, offset, mask, w, padding=1))
    ref = np.asarray(
        jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_modulated_deform_conv_integer_shift(rng):
    """A constant integer offset shifts the sampling grid."""
    x = jnp.asarray(rng.standard_normal((1, 10, 10, 3)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 2)).astype(np.float32) * 0.1)
    # offset (dy=1, dx=0) for every tap == sampling one row down
    offset = jnp.zeros((1, 10, 10, 18)).at[..., 0::2].set(1.0)
    got = np.asarray(modulated_deform_conv2d(x, offset, None, w, padding=1))
    shifted = jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)
    ref_full = np.asarray(
        jax.lax.conv_general_dilated(
            shifted, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    # interior rows (border rows differ: zero-pad vs out-of-range sampling)
    np.testing.assert_allclose(got[:, 1:-2], ref_full[:, 1:-2], rtol=1e-4,
                               atol=1e-5)


def test_vssm_classifier_forward(rng):
    from bem_tpu.nn.vssm import VSSM

    net = VSSM(patch_size=4, num_classes=10, depths=(1, 1), dims=(8, 16),
               ssm_d_state=1, ssm_ratio=1.0, ssm_conv_bias=False,
               forward_type="v05_noz", mlp_ratio=2.0, drop_path_rate=0.0,
               downsample_version="v2", patchembed_version="v1")
    x = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    logits = jax.jit(net.apply)(params, x)
    assert logits.shape == (2, 10)
    assert np.isfinite(np.asarray(logits)).all()


def test_vssm_classification_train_step(rng):
    from bem_tpu.nn.vssm import VSSM
    from bem_tpu.classification.train import make_trainer

    net = VSSM(patch_size=4, num_classes=5, depths=(1, 1), dims=(8, 16),
               ssm_d_state=1, ssm_ratio=1.0, ssm_conv_bias=False,
               forward_type="v05_noz", mlp_ratio=2.0, drop_path_rate=0.0)
    images = rng.random((4, 32, 32, 3)).astype(np.float32)
    labels = rng.integers(0, 5, (4,))
    state, train_step, eval_step = make_trainer(net, images, total_steps=4)
    losses = []
    for _ in range(3):
        state, loss = train_step(state, jnp.asarray(images), jnp.asarray(labels))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    t1, t5 = eval_step(state.params, jnp.asarray(images), jnp.asarray(labels))
    assert 0.0 <= float(t1) <= 1.0 and float(t5) >= float(t1)
