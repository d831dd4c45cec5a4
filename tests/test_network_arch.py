"""Forward/shape/Bayesian-semantics tests for the Network (UNet) arch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bem_tpu.archs import build_network
from bem_tpu.bayesian import (
    get_kl_loss,
    update_prior_ema,
    sample_rngs,
    extract_bayes_prior,
)


CFG = dict(
    type="Network",
    in_channels=3,
    out_channels=3,
    n_feat=8,
    stage=1,
    num_blocks=[1, 1, 1],
    d_state=[1, 1, 1],
    ssm_ratio=1,
    mlp_ratio=2,
    mlp_type="gdmlp",
    use_pixelshuffle=True,
)

X = jnp.ones((1, 8, 8, 3))


@pytest.fixture(scope="module")
def det_net():
    net = build_network(dict(CFG))
    variables = jax.jit(net.init)(jax.random.key(0), X)
    return net, variables


@pytest.fixture(scope="module")
def bayes_net():
    cfg = dict(CFG)
    cfg["bayesian"] = True
    net = build_network(cfg)
    variables = jax.jit(net.init)(jax.random.key(0), X)
    return net, variables


def test_network_forward_shapes(det_net):
    net, variables = det_net
    outs = jax.jit(net.apply)(variables, X)
    assert len(outs) == 2
    assert outs[0].shape == (1, 8, 8, 3)
    assert outs[1].shape == (1, 8, 8, 3)


def test_network_deconv_path():
    cfg = dict(CFG)
    cfg["use_pixelshuffle"] = False
    net = build_network(cfg)
    variables = jax.jit(net.init)(jax.random.key(0), X)
    outs = net.apply(variables, X)
    assert outs[-1].shape == (1, 8, 8, 3)


def test_network_mim_mask_changes_output(det_net):
    net, variables = det_net
    mask = jnp.ones((1, 8, 8))
    y0 = net.apply(variables, X)[-1]
    y1 = net.apply(variables, X, mask)[-1]
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


def test_bayesian_param_structure(bayes_net):
    net, variables = bayes_net
    params = variables["params"]
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = ["/".join(str(p) for p in path) for path, _ in flat]
    # bayesian params exist inside VSS blocks only
    assert any("mu_kernel" in n for n in names)
    assert not any("first_conv" in n and "mu_" in n for n in names)
    # raw SSM parameters are never bayesian (tools.py:53-63 skips them)
    assert not any("x_proj_weight" in n and "mu_" in n for n in names)


def test_bayesian_sampling_semantics(bayes_net):
    net, variables = bayes_net
    apply = jax.jit(lambda v, x: net.apply(v, x)[-1])
    y_det1 = apply(variables, X)
    y_det2 = apply(variables, X)
    np.testing.assert_array_equal(np.asarray(y_det1), np.asarray(y_det2))

    sample = jax.jit(
        lambda v, x, k: net.apply(v, x, rngs={"bayes": k})[-1]
    )
    y_s1 = sample(variables, X, jax.random.key(1))
    y_s2 = sample(variables, X, jax.random.key(2))
    assert not np.allclose(np.asarray(y_s1), np.asarray(y_s2))

    # K-sample inference via vmap over rngs
    keys = sample_rngs(jax.random.key(3), 4)
    ys = jax.jit(
        jax.vmap(lambda k: net.apply(variables, X, rngs={"bayes": k})[-1])
    )(keys)
    assert ys.shape == (4, 1, 8, 8, 3)
    assert len(np.unique(np.asarray(ys).round(6), axis=0)) == 4


def test_bayesian_kl_and_prior_ema(bayes_net):
    net, variables = bayes_net
    params = variables["params"]
    prior = extract_bayes_prior(params)

    # KL(posterior || prior) == 0 at init (prior copies posterior)
    kl0 = get_kl_loss(params, prior)
    np.testing.assert_allclose(float(kl0), 0.0, atol=1e-6)

    params2 = jax.tree.map(lambda p: p + 0.05, params)
    kl_before = float(get_kl_loss(params2, prior))
    assert kl_before > 0

    # at step 0 the thresholded decay is 1/10 -> prior moves 90% toward posterior
    prior2 = update_prior_ema(prior, params2, step=0, decay=0.9998)
    p0 = jax.tree_util.tree_leaves(prior)[0]
    p1 = jax.tree_util.tree_leaves(prior2)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    kl_after = float(get_kl_loss(params2, prior2))
    assert kl_after < kl_before
