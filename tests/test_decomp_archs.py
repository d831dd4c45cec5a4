"""Forward shapes for every registered arch + frozen-decomp training test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bem_tpu.archs import build_network
from bem_tpu.models import build_model


SMALL = dict(
    n_feat=8, stage=1, num_blocks=[1, 1], d_state=[1, 1],
    ssm_ratio=1, mlp_ratio=2, mlp_type="gdmlp", use_pixelshuffle=False,
)

X6 = jnp.ones((1, 8, 8, 6))
X3 = jnp.ones((1, 8, 8, 3))


@pytest.mark.parametrize("arch,in_ch", [
    ("VMUNet", 3),
    ("NaiveVMUNetTwoBranch", 3),
    ("TunedModel", 3),
    ("FusedTunedModel", 3),
    ("DecompSingleBranch", 6),
    ("DecompSingleBranchDD", 6),
    ("DecompDualBranch", 6),
    ("DecompDualBranch2", 6),
    ("DecompDualBranch2DD", 6),
    ("DecompDualBranchDDWavelet", 6),
])
def test_arch_forward_shapes(arch, in_ch):
    cfg = dict(SMALL)
    cfg.update(type=arch, in_channels=in_ch, out_channels=3)
    if arch.startswith("Decomp"):
        cfg["decomp_model"] = "model1"
    net = build_network(cfg)
    x = X6 if in_ch == 6 else X3
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    outs = jax.jit(lambda v, x: net.apply(v, x))(variables, x)
    assert outs[-1].shape == (1, 8, 8, 3), arch
    assert np.isfinite(np.asarray(outs[-1])).all(), arch


def test_decomp_frozen_during_training(rng):
    opt = {
        "name": "t", "model_type": "ImageEnhancer", "is_train": True,
        "manual_seed": 0,
        "condition": {"type": "mean", "scale_down": 4, "noise_level": 0.1},
        "network_g": dict(SMALL, type="DecompDualBranchDDWavelet",
                          in_channels=6, out_channels=3, decomp_model="model4"),
        "datasets": {"train": {"mini_batch_sizes": [2]}},
        "path": {"experiments_root": "/tmp/bem_frozen_test"},
        "train": {
            "total_iter": 4, "warmup_iter": -1, "max_grad_norm": 1,
            "optim_g": {"type": "AdamW", "lr": 1e-3, "weight_decay": 1e-2,
                        "betas": [0.9, 0.999]},
            "mixing_augs": {"mixup": False},
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1, "reduction": "mean"},
        },
        "val": {},
    }
    model = build_model(opt)
    batch = {
        "lq": rng.random((2, 8, 8, 3)).astype(np.float32),
        "gt": rng.random((2, 8, 8, 3)).astype(np.float32),
        "gt_down": rng.random((2, 2, 2, 3)).astype(np.float32),
    }
    model.init_state(batch, seed=0)

    # frozen decomp params were injected from the shipped checkpoint
    from bem_tpu.qd.convert import load_decomp_params

    ref = load_decomp_params("model4")
    got = model.state.params["decomp"]["conv_in"]["kernel"]
    np.testing.assert_allclose(np.asarray(got), ref["conv_in"]["kernel"], rtol=1e-6)

    decomp_before = jax.tree_util.tree_leaves(model.state.params["decomp"])
    for _ in range(2):
        logs = model.train_step(batch)
    assert np.isfinite(float(logs["l_total"]))
    decomp_after = jax.tree_util.tree_leaves(model.state.params["decomp"])
    for b, a in zip(decomp_before, decomp_after):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    # but the trainable branches moved
    b0 = model.state.params["branches"]
    assert float(logs["grad_norm"]) > 0
