"""Folded DualUpSample == reference composition (same params).

The serving path folds up_p_conv2 / up_b_conv2 / conv down to quarter
resolution through PixelShuffle / bilinear commutation
(arch_util.py DualUpSample, reference UNet_arch.py:97-155). These tests pin:
  * identical parameter trees and init values between the two forms,
  * fp32 output equality to rounding in both layouts,
  * bf16 serving-dtype equality within bf16 tolerance.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bem_tpu.archs.arch_util import DualUpSample


def _apply_both(m, x):
    old = os.environ.get("BEM_FUSED_UPSAMPLE")
    try:
        os.environ["BEM_FUSED_UPSAMPLE"] = "0"
        v0 = m.init(jax.random.PRNGKey(0), x)
        y_ref = m.apply(v0, x)
        os.environ["BEM_FUSED_UPSAMPLE"] = "1"
        v1 = m.init(jax.random.PRNGKey(0), x)
        y_fold = m.apply(v0, x)
    finally:
        if old is None:
            os.environ.pop("BEM_FUSED_UPSAMPLE", None)
        else:
            os.environ["BEM_FUSED_UPSAMPLE"] = old
    return v0, v1, y_ref, y_fold


@pytest.mark.parametrize("layout", ["NHWC", "NCHW"])
def test_fold_matches_fp32(layout):
    c = 16
    x = np.random.default_rng(0).random((2, 8, 10, c)).astype(np.float32)
    if layout == "NCHW":
        x = x.transpose(0, 3, 1, 2)
    x = jnp.asarray(x)
    m = DualUpSample(c, 2, layout=layout)
    v0, v1, y_ref, y_fold = _apply_both(m, x)

    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    for a, b in zip(jax.tree_util.tree_leaves(v0), jax.tree_util.tree_leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(
        np.asarray(y_ref), np.asarray(y_fold), atol=5e-6, rtol=1e-5)


def test_fold_matches_bf16():
    c = 32
    x = jnp.asarray(
        np.random.default_rng(1).random((1, 12, 16, c)), jnp.bfloat16)
    m = DualUpSample(c, 2)
    _, _, y_ref, y_fold = _apply_both(m, x)
    np.testing.assert_allclose(
        np.asarray(y_ref, np.float32), np.asarray(y_fold, np.float32),
        atol=0.05, rtol=0.05)


def test_fold_matches_network_level():
    """Whole U-Net: the phase-2 fold (SubNetwork's fusion_i conv folded into
    the upsample tail + a skip-side 1x1) keeps the same param tree, init
    values and outputs (fp32 rounding)."""
    from bem_tpu.archs import build_network

    cfg = dict(type="Network", in_channels=3, out_channels=3, n_feat=16,
               stage=1, num_blocks=(1, 1, 1), d_state=(1, 1, 1), ssm_ratio=1,
               mlp_ratio=4, mlp_type="gdmlp", use_pixelshuffle=True)
    net = build_network(cfg)
    x = jnp.asarray(np.random.default_rng(0).random((1, 32, 48, 3)),
                    jnp.float32)
    old = os.environ.get("BEM_FUSED_UPSAMPLE")
    try:
        os.environ["BEM_FUSED_UPSAMPLE"] = "0"
        v0 = net.init(jax.random.PRNGKey(0), x)
        y0 = net.apply(v0, x)[-1]
        os.environ["BEM_FUSED_UPSAMPLE"] = "1"
        v1 = net.init(jax.random.PRNGKey(0), x)
        y1 = net.apply(v0, x)[-1]
    finally:
        if old is None:
            os.environ.pop("BEM_FUSED_UPSAMPLE", None)
        else:
            os.environ["BEM_FUSED_UPSAMPLE"] = old
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    for a, b in zip(jax.tree_util.tree_leaves(v0),
                    jax.tree_util.tree_leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=5e-6, rtol=1e-5)


def test_fold_default_gate():
    """Auto-on only for the bf16 stream (fp32 keeps the reference order)."""
    from bem_tpu.archs.arch_util import _fold_dual_upsample

    assert os.environ.get("BEM_FUSED_UPSAMPLE") is None
    assert _fold_dual_upsample(jnp.bfloat16)
    assert not _fold_dual_upsample(jnp.float32)
