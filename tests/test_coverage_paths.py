"""Coverage for secondary paths: histogram condition, windowed SS2D, EMA,
option overrides, schedulers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bem_tpu.models import build_model


def test_histogram_condition_training(rng):
    """ConditionGenerator on KDE-histogram conditions end-to-end."""
    bins, patch = 8, 4
    opt = {
        "name": "hist", "model_type": "ConditionGenerator", "is_train": True,
        "manual_seed": 0,
        "condition": {"type": "histogram", "hist_patch_size": patch,
                      "num_bins": bins, "noise_level": 0.1},
        "network_g": {"type": "Network", "in_channels": bins * 3,
                      "out_channels": bins * 3, "n_feat": 8,
                      "num_blocks": [1, 1], "d_state": [1, 1], "ssm_ratio": 1,
                      "mlp_ratio": 2, "use_pixelshuffle": True},
        "datasets": {"train": {"mini_batch_sizes": [2]}},
        "path": {"experiments_root": "/tmp/bem_hist"},
        "train": {"total_iter": 2, "warmup_iter": -1, "max_grad_norm": 1,
                  "optim_g": {"type": "AdamW", "lr": 1e-3, "weight_decay": 0,
                              "betas": [0.9, 0.999]},
                  "mixing_augs": {"mixup": False},
                  "pixel_opt": {"type": "L1Loss", "loss_weight": 1,
                                "reduction": "mean"}},
        "val": {},
    }
    from bem_tpu.utils.histogram import histogram_condition

    img = rng.random((16, 16, 3)).astype(np.float32)
    hist = histogram_condition(img, patch, bins)
    assert hist.shape == (4, 4, bins * 3)
    np.testing.assert_allclose(
        hist.reshape(4, 4, bins * 3).sum(-1), 3.0, rtol=1e-3
    )  # 3 normalized per-channel PDFs

    batch = {
        "hist_lq": np.stack([hist, hist]),
        "hist_gt": np.stack([hist, hist]),
    }
    model = build_model(opt)
    model.init_state(batch, seed=0)
    logs = model.train_step(batch)
    assert np.isfinite(float(logs["l_total"]))
    assert float(logs["l_kl"]) >= 0


def test_windowed_vssblock(rng):
    """grid_size window partition path (vmamba.py:1336-1371)."""
    from bem_tpu.nn.vss import VSSBlock

    x = jnp.asarray(rng.standard_normal((1, 10, 14, 8)).astype(np.float32))
    blk = VSSBlock(hidden_dim=8, grid_size=4, mlp_ratio=2)
    v = jax.jit(blk.init)(jax.random.PRNGKey(0), x)
    y = blk.apply(v, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_ema_params_track_training(rng):
    opt = {
        "name": "ema", "model_type": "ImageEnhancer", "is_train": True,
        "manual_seed": 0,
        "condition": {"type": "mean", "scale_down": 4, "noise_level": 0.0},
        "network_g": {"type": "Network", "in_channels": 6, "out_channels": 3,
                      "n_feat": 8, "num_blocks": [1, 1], "d_state": [1, 1],
                      "ssm_ratio": 1, "mlp_ratio": 2, "use_pixelshuffle": True},
        "datasets": {"train": {"mini_batch_sizes": [2]}},
        "path": {"experiments_root": "/tmp/bem_ema"},
        "train": {"total_iter": 2, "warmup_iter": -1, "max_grad_norm": 1,
                  "ema_decay": 0.9,
                  "optim_g": {"type": "AdamW", "lr": 1e-2, "weight_decay": 0,
                              "betas": [0.9, 0.999]},
                  "mixing_augs": {"mixup": False},
                  "pixel_opt": {"type": "L1Loss", "loss_weight": 1,
                                "reduction": "mean"}},
        "val": {},
    }
    batch = {
        "lq": rng.random((2, 8, 8, 3)).astype(np.float32),
        "gt": rng.random((2, 8, 8, 3)).astype(np.float32),
        "gt_down": rng.random((2, 2, 2, 3)).astype(np.float32),
    }
    model = build_model(opt)
    model.init_state(batch, seed=0)
    assert model.state.ema_params is not None
    p0 = np.asarray(jax.tree_util.tree_leaves(model.state.ema_params)[0])
    model.train_step(batch)
    e1 = jax.tree_util.tree_leaves(model.state.ema_params)[0]
    q1 = jax.tree_util.tree_leaves(model.state.params)[0]
    # EMA moved, but lags the raw params
    assert not np.allclose(p0, np.asarray(e1))
    assert not np.allclose(np.asarray(e1), np.asarray(q1))


def test_force_yml_and_debug(tmp_path):
    from bem_tpu.utils.options import parse_options

    yml = tmp_path / "o.yml"
    yml.write_text("""
name: t
model_type: ImageEnhancer
manual_seed: 1
datasets: {}
path: {}
train: {ema_decay: 0}
val: {val_freq: 100}
logger: {print_freq: 50, save_checkpoint_freq: 100}
""")
    opt, args = parse_options(
        str(tmp_path), is_train=True,
        args_list=["--opt", str(yml), "--debug",
                   "--force_yml", "train:ema_decay=0.999"],
    )
    assert opt["train"]["ema_decay"] == 0.999
    assert opt["name"].startswith("debug_")
    assert opt["val"]["val_freq"] == 8
    assert opt["logger"]["print_freq"] == 1
    assert opt["path"]["experiments_root"].endswith("experiments/debug_t")


def test_lr_schedules_match_reference_semantics():
    from bem_tpu.models.lr_scheduler import (
        build_schedule,
        cosine_annealing_restart_cyclic_lr,
        with_warmup,
    )

    sched = cosine_annealing_restart_cyclic_lr(
        2e-4, [150000, 46000, 104000], [1, 1, 1], [2e-4, 2e-4, 1e-6]
    )
    # period 1 has eta_min == base lr -> constant
    assert float(sched(0)) == pytest.approx(2e-4)
    assert float(sched(100000)) == pytest.approx(2e-4)
    # period boundaries restart the cosine
    assert float(sched(150001)) == pytest.approx(2e-4, rel=1e-3)
    # final period decays toward 1e-6
    assert float(sched(299999)) == pytest.approx(1e-6, rel=2e-1)

    warm = with_warmup(sched, 100, 2e-4)
    assert float(warm(0)) == pytest.approx(2e-6)
    assert float(warm(99)) == pytest.approx(2e-4)
    assert float(warm(200)) == pytest.approx(float(sched(200)))

    s2 = build_schedule(1e-3, {"type": "MultiStepRestartLR",
                               "milestones": [10, 20], "gamma": 0.1})
    assert float(s2(5)) == pytest.approx(1e-3)
    assert float(s2(15)) == pytest.approx(1e-4)
    assert float(s2(25)) == pytest.approx(1e-5)
