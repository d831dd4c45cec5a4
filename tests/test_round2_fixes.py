"""Round-2 gate fixes: strict load, perceptual hard-fail, remat, v3 honesty."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bem_tpu.models import build_model
from bem_tpu.nn.vss import VSSBlock
from bem_tpu.utils import checkpoint as ckpt

from test_trainers import make_opt, make_batch


def test_strict_load_raises_on_shape_mismatch(tmp_path):
    opt = make_opt()
    model = build_model(opt)
    rng = np.random.default_rng(0)
    model.init_state(make_batch(rng), seed=0)

    # save, then perturb one leaf's shape and expect strict load to raise
    good = str(tmp_path / "net_good.msgpack")
    ckpt.save_params(good, model.state.params)
    model.load_network(good, strict=True)  # round-trip must pass

    params = jax.device_get(model.state.params)
    flat = jax.tree_util.tree_leaves_with_path(params)
    path0 = jax.tree_util.keystr(flat[0][0])

    def mutate(tree):
        # double the first leaf along axis 0
        return jax.tree_util.tree_map_with_path(
            lambda p, v: np.concatenate([v, v], 0)
            if jax.tree_util.keystr(p) == path0
            else v,
            tree,
        )

    bad = str(tmp_path / "net_bad.msgpack")
    ckpt.save_params(bad, mutate(params))
    with pytest.raises(ValueError, match="size-mismatched"):
        model.load_network(bad, strict=True)
    # non-strict load keeps the model's own leaf for the mismatched key
    model.load_network(bad, strict=False)
    leaf_after = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(model.state.params)
    )[path0]
    assert leaf_after.shape == flat[0][1].shape


def test_perceptual_raises_without_weights(monkeypatch):
    from bem_tpu.losses.perceptual import PerceptualLoss

    monkeypatch.delenv("BEM_VGG19_WEIGHTS", raising=False)
    monkeypatch.delenv("BEM_ALLOW_RANDOM_VGG", raising=False)
    if os.path.exists(os.path.expanduser("~/.cache/bem_tpu/vgg19_features.npz")):
        pytest.skip("real VGG19 weights present")
    with pytest.raises(FileNotFoundError, match="VGG19"):
        PerceptualLoss({"conv5_4": 1.0})
    monkeypatch.setenv("BEM_ALLOW_RANDOM_VGG", "1")
    loss = PerceptualLoss({"conv1_2": 1.0})  # opt-in fallback still works
    p, s = loss(jnp.ones((1, 8, 8, 3)), jnp.zeros((1, 8, 8, 3)))
    assert np.isfinite(float(p))


def test_use_checkpoint_same_outputs_and_grads():
    kw = dict(hidden_dim=16, ssm_d_state=1, ssm_ratio=1.0, mlp_ratio=2.0,
              forward_type="v05_noz", scan_backend="xla")
    a = VSSBlock(use_checkpoint=False, **kw)
    b = VSSBlock(use_checkpoint=True, **kw)
    x = jnp.asarray(np.random.default_rng(0).random((2, 8, 8, 16)), jnp.float32)
    va = a.init(jax.random.PRNGKey(0), x)
    vb = b.init(jax.random.PRNGKey(0), x)
    # same param tree (remat must not change the param structure)
    ja = jax.tree_util.tree_structure(va)
    jb = jax.tree_util.tree_structure(vb)
    assert ja == jb
    ya = a.apply(va, x)
    yb = b.apply(vb, x)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), rtol=1e-6, atol=1e-6)

    def loss_a(p):
        return jnp.sum(a.apply(p, x) ** 2)

    def loss_b(p):
        return jnp.sum(b.apply(p, x) ** 2)

    ga = jax.grad(loss_a)(va)
    gb = jax.grad(loss_b)(vb)
    for la, lb in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=1e-6)


def test_unknown_forward_type_raises():
    from bem_tpu.nn.ss2d import SS2D

    net = SS2D(d_model=8, forward_type="v3_noz")
    x = jnp.ones((1, 8, 8, 8))
    with pytest.raises(NotImplementedError):
        net.init(jax.random.PRNGKey(0), x)
