"""Channel-first (NCHW) layout mode: parity with NHWC on shared params."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bem_tpu.archs import build_network
from bem_tpu.nn.vss import VSSBlock


def test_vssblock_layouts_match(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 12, 16)).astype(np.float32))
    blk = VSSBlock(hidden_dim=16, mlp_ratio=2, scan_backend="xla")
    v = jax.jit(blk.init)(jax.random.PRNGKey(0), x)
    y = blk.apply(v, x)
    blk_cf = VSSBlock(hidden_dim=16, mlp_ratio=2, scan_backend="xla",
                      layout="NCHW")
    y_cf = blk_cf.apply(v, jnp.transpose(x, (0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(y_cf, (0, 2, 3, 1))), np.asarray(y),
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.parametrize("use_pixelshuffle", [True, False])
def test_network_layouts_match(rng, use_pixelshuffle):
    x = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    cfg = dict(type="Network", n_feat=8, num_blocks=[1, 1], d_state=[1, 1],
               ssm_ratio=1, mlp_ratio=2, use_pixelshuffle=use_pixelshuffle,
               scan_backend="xla")
    net = build_network(dict(cfg))
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    y = net.apply(v, x)[-1]
    net_cf = build_network(dict(cfg, layout="NCHW"))
    y_cf = net_cf.apply(v, x)[-1]  # public API stays NHWC
    np.testing.assert_allclose(np.asarray(y_cf), np.asarray(y),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("use_pixelshuffle", [True, False])
def test_network_stream_cf_matches(rng, use_pixelshuffle):
    """stream_cf=True (whole SubNetwork stream channel-first, one transpose
    pair at full res) == the NHWC plumbing on shared params — the round-5
    serving seam change (PatchMerging/DualUpSample/fusion run CF)."""
    x = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    cfg = dict(type="Network", n_feat=8, num_blocks=[1, 1], d_state=[1, 1],
               ssm_ratio=1, mlp_ratio=2, use_pixelshuffle=use_pixelshuffle,
               scan_backend="pallas")
    net = build_network(dict(cfg, stream_cf=False))
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    y = net.apply(v, x)[-1]
    net_cf = build_network(dict(cfg, stream_cf=True))
    y_cf = net_cf.apply(v, x)[-1]
    np.testing.assert_allclose(np.asarray(y_cf), np.asarray(y),
                               rtol=1e-4, atol=1e-5)


def test_network_io_cf_matches(rng, monkeypatch):
    """BEM_IO_CF=1: first_conv/proj run channel-first too (boundary
    transposes on the 3/6-channel IO tensors only) — same params, same
    output."""
    x = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    cfg = dict(type="Network", n_feat=8, num_blocks=[1, 1], d_state=[1, 1],
               ssm_ratio=1, mlp_ratio=2, use_pixelshuffle=True,
               scan_backend="pallas")
    net = build_network(dict(cfg, stream_cf=False))
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    y = net.apply(v, x)[-1]
    monkeypatch.setenv("BEM_IO_CF", "1")
    y_io = build_network(dict(cfg, stream_cf=True)).apply(v, x)[-1]
    np.testing.assert_allclose(np.asarray(y_io), np.asarray(y),
                               rtol=1e-4, atol=1e-5)


def test_network_cf_mask_path(rng):
    x = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    mask = jnp.ones((1, 8, 8))
    cfg = dict(type="Network", n_feat=8, num_blocks=[1, 1], d_state=[1, 1],
               ssm_ratio=1, mlp_ratio=2, use_pixelshuffle=True,
               scan_backend="xla")
    net = build_network(dict(cfg))
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    net_cf = build_network(dict(cfg, layout="NCHW"))
    y = net.apply(v, x, mask)[-1]
    y_cf = net_cf.apply(v, x, mask)[-1]
    np.testing.assert_allclose(np.asarray(y_cf), np.asarray(y),
                               rtol=1e-4, atol=1e-5)

def test_vssblock_cf_tiny_image_fallback(rng):
    """CG-stage /16-resolution shapes (e.g. 28x40) cannot lower the
    row-blocked fused kernels on TPU (lane count not 128-divisible); the
    pallas backend must fall back and still match NHWC. Regression for the
    round-3 bench-pipeline lowering failure."""
    from bem_tpu.ops.gdmlp_fused import _pick_rows, fused_rows_ok

    # 28x40 -> whole-image single block (1120 lanes <= budget)
    assert _pick_rows(28, 40) == 28
    # too big for one block, no 128-divisible k -> unfused fallback
    assert not fused_rows_ok(400, 600)
    # serving shapes keep the swept k=8 blocking
    assert _pick_rows(448, 640) == 8

    # 12x20: single-block kernel path; 8x1100: H*W > budget with no
    # 128-divisible k -> the unfused CF fallback executes
    for H, W in ((12, 20), (8, 1100)):
        x = jnp.asarray(
            rng.standard_normal((1, H, W, 16)).astype(np.float32))
        blk = VSSBlock(hidden_dim=16, mlp_ratio=2, scan_backend="xla")
        v = jax.jit(blk.init)(jax.random.PRNGKey(0), x)
        y = blk.apply(v, x)
        blk_cf = VSSBlock(hidden_dim=16, mlp_ratio=2, scan_backend="pallas",
                          layout="NCHW")
        y_cf = blk_cf.apply(v, jnp.transpose(x, (0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(y_cf, (0, 2, 3, 1))), np.asarray(y),
            rtol=1e-4, atol=1e-4,
        )
