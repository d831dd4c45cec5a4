"""End-to-end train-step tests for ImageEnhancer and ConditionGenerator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bem_tpu.models import build_model


def make_opt(model_type="ImageEnhancer", bayes=False):
    return {
        "name": "test_exp",
        "model_type": model_type,
        "is_train": True,
        "manual_seed": 100,
        "condition": {"type": "mean", "scale_down": 4, "noise_level": 0.1},
        "network_g": {
            "type": "Network",
            "in_channels": 6 if model_type == "ImageEnhancer" else 3,
            "out_channels": 3,
            "n_feat": 8,
            "stage": 1,
            "num_blocks": [1, 1, 1],
            "d_state": [1, 1, 1],
            "ssm_ratio": 1,
            "mlp_ratio": 2,
            "use_pixelshuffle": True,
        },
        "datasets": {"train": {"mini_batch_sizes": [2]}},
        "path": {"experiments_root": "/tmp/bem_test_exp"},
        "train": {
            "total_iter": 10,
            "warmup_iter": -1,
            "max_grad_norm": 1,
            "scheduler": {
                "type": "CosineAnnealingRestartCyclicLR",
                "periods": [5, 5],
                "restart_weights": [1, 1],
                "eta_mins": [0.0002, 0.000001],
            },
            "optim_g": {"type": "AdamW", "lr": 2e-4, "weight_decay": 1e-4,
                        "betas": [0.9, 0.999]},
            "mixing_augs": {"mixup": False},
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1, "reduction": "mean"},
        },
        "val": {"window_size": 8, "metrics": {
            "psnr": {"type": "calculate_psnr", "crop_border": 0},
            "ssim": {"type": "calculate_ssim", "crop_border": 0},
        }},
    }


def make_batch(rng, B=2, H=16, W=16, down=4):
    return {
        "lq": rng.random((B, H, W, 3)).astype(np.float32),
        "gt": rng.random((B, H, W, 3)).astype(np.float32),
        "lq_down": rng.random((B, H // down, W // down, 3)).astype(np.float32),
        "gt_down": rng.random((B, H // down, W // down, 3)).astype(np.float32),
    }


def test_image_enhancer_train_steps(rng):
    model = build_model(make_opt("ImageEnhancer"))
    batch = make_batch(rng)
    model.init_state(batch, seed=0)
    losses = []
    for _ in range(5):
        logs = model.train_step(batch)
        losses.append(float(logs["l_total"]))
    assert int(model.state.step) == 5
    assert np.isfinite(losses).all()
    # same fixed batch -> loss should clearly decrease over a few steps
    assert losses[-1] < losses[0]
    assert float(logs["lr"]) > 0


def test_condition_generator_train_steps(rng):
    model = build_model(make_opt("ConditionGenerator"))
    batch = make_batch(rng)
    model.init_state(batch, seed=0)
    l0 = model.train_step(batch)
    assert "l_kl" in l0 and np.isfinite(float(l0["l_kl"]))
    prior0 = jax.tree_util.tree_leaves(model.state.bayes_prior)[0].copy()
    for _ in range(3):
        logs = model.train_step(batch)
    prior1 = jax.tree_util.tree_leaves(model.state.bayes_prior)[0]
    # prior EMA must move during training (conv.py:91-104)
    assert not np.allclose(np.asarray(prior0), np.asarray(prior1))
    # deterministic eval works without rng
    out = model.nonpad_test(jnp.asarray(batch["lq_down"]))
    assert out.shape == batch["lq_down"].shape
    # K-sample vmapped inference differs across samples
    ys = model.sample(jnp.asarray(batch["lq_down"]), jax.random.key(0), num_samples=3)
    assert ys.shape[0] == 3
    assert not np.allclose(np.asarray(ys[0]), np.asarray(ys[1]))


def test_enhancer_save_resume(tmp_path, rng):
    opt = make_opt("ImageEnhancer")
    opt["path"]["experiments_root"] = str(tmp_path)
    model = build_model(opt)
    batch = make_batch(rng)
    model.init_state(batch, seed=0)
    model.train_step(batch)
    model.save(epoch=0, current_iter=1)

    model2 = build_model(opt)
    model2.init_state(batch, seed=1)
    model2.resume_training(str(tmp_path / "training_states" / "1.state"))
    assert int(model2.state.step) == 1
    p1 = jax.tree_util.tree_leaves(model.state.params)[0]
    p2 = jax.tree_util.tree_leaves(model2.state.params)[0]
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    # continuing training from the restored state works
    model2.train_step(batch)
    assert int(model2.state.step) == 2
