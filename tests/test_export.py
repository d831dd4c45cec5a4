"""Serving-artifact export roundtrip: serialize the jitted two-stage
pipeline (tiny shapes, XLA scan backend) and run the deserialized artifact
without the model code in scope."""

import numpy as np

import jax
import jax.numpy as jnp

from bem_tpu.archs import build_network
from bem_tpu.enhancement.export import export_pipeline, load_pipeline


def test_export_roundtrip(tmp_path):
    common = dict(n_feat=8, stage=1, num_blocks=(1, 1), d_state=(1, 1),
                  ssm_ratio=1, mlp_ratio=2, mlp_type="gdmlp",
                  use_pixelshuffle=True, scan_backend="xla")
    cg = build_network(dict(type="Network", in_channels=3, out_channels=3,
                            bayesian=True, **common))
    ie = build_network(dict(type="Network", in_channels=6, out_channels=3,
                            **common))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    cond = jnp.asarray(rng.random((1, 8, 8, 3)), jnp.float32)
    cg_vars = jax.jit(cg.init)(jax.random.PRNGKey(0), cond)
    ie_vars = jax.jit(ie.init)(
        jax.random.PRNGKey(1), jnp.concatenate([img, img], -1))

    K = 4

    def pipeline(key, img, cond):
        keys = jax.random.split(key, K)
        conds = jax.vmap(
            lambda k: cg.apply(cg_vars, cond, rngs={"bayes": k})[-1])(keys)
        conds = jnp.clip(conds, 0, 1).reshape(K, 8, 8, 3)
        up = jax.image.resize(conds, (K, 32, 32, 3), "bilinear")
        inp = jnp.concatenate(
            [jnp.broadcast_to(img, (K, 32, 32, 3)), up], axis=-1)
        return ie.apply(ie_vars, inp)[-1]

    key = jax.random.PRNGKey(7)
    want = np.asarray(jax.jit(pipeline)(key, img, cond))

    path = str(tmp_path / "pipe.jaxexport")
    export_pipeline(pipeline, (key, img, cond), path)
    g = load_pipeline(path)
    got = np.asarray(g(key, img, cond))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # shape mismatch fails loudly
    bad = jnp.zeros((1, 16, 16, 3), jnp.float32)
    try:
        g(key, bad, cond)
        raised = False
    except Exception:
        raised = True
    assert raised
