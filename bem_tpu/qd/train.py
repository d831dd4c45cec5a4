"""QD decomposition trainer (reference: basicsr/QD/train2.py:130-350).

python -m bem_tpu.qd.train --model_type model4 --low_dir ... --high_dir ...

Parity points: AdamW 3e-4 (train2.py:200), linear warmup -> cosine decay
(:202-206), first `warmup_epochs` epochs optimize reconstruction only
(:258-261), extended RetinexLoss (+TV +FFT) afterwards, per-epoch val
PSNR/SSIM of the Hamilton reconstruction (:292-318), checkpoint per epoch.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization, struct

from ..data import DataLoader
from ..metrics.psnr_ssim import calculate_psnr_jax, calculate_ssim_jax
from ..ops.quaternion import hamilton_product
from ..utils.logger import get_root_logger
from .dataset import PairDataset
from .loss import RetinexLoss
from .models import Decomp


class QDTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


def make_schedule(base_lr: float, total_epochs: int, steps_per_epoch: int,
                  warmup_epochs: int = 10, lr_min: float = 1e-7):
    """Reference-exact LR (train2.py:203-211): LinearLR(start_factor=1.0)
    keeps lr CONSTANT for warmup_epochs, then CosineAnnealingLR with
    T_max = total - warmup, eta_min = lr_min; scheduler stepped once per
    EPOCH with one extra step() before the loop (one-epoch phase shift)."""
    t_max = max(total_epochs - warmup_epochs, 1)

    def sched(step):
        epoch = step // steps_per_epoch + 1  # the pre-loop scheduler.step()
        cos_t = jnp.clip(epoch - warmup_epochs, 0, t_max)
        return lr_min + (base_lr - lr_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * cos_t / t_max)
        )

    return sched


def train_qd(
    model_type: str = "model4",
    low_dir: str = "data/LOLv1/Train/input",
    high_dir: str = "data/LOLv1/Train/target",
    val_low_dir: str = None,
    val_high_dir: str = None,
    epochs: int = 1000,
    batch_size: int = 8,
    patch_size: int = 256,
    lr: float = 3e-4,
    recon_only_epochs: int = 50,
    out_dir: str = "experiments/qd",
    seed: int = 0,
    num_workers: int = 4,
    log_every: int = 50,
    save_every: int = 1,
):
    logger = get_root_logger()
    dataset = PairDataset(low_dir, high_dir, patch_size=patch_size, train=True, seed=seed)
    loader = DataLoader(dataset, batch_size=batch_size, shuffle=True,
                        num_workers=num_workers, drop_last=True, seed=seed)
    steps_per_epoch = max(len(loader), 1)

    net = Decomp(model_type=model_type)
    rng = jax.random.PRNGKey(seed)
    example = jnp.zeros((1, patch_size, patch_size, 3))
    params = jax.jit(net.init)(rng, example)["params"]
    schedule = make_schedule(lr, epochs, steps_per_epoch)
    # torch AdamW default weight_decay=0.01 (train2.py:200)
    tx = optax.adamw(schedule, weight_decay=0.01)
    state = QDTrainState(step=jnp.zeros((), jnp.int32), params=params,
                         opt_state=tx.init(params))

    criterion = RetinexLoss(extended=True)

    @partial(jax.jit, static_argnames=("recon_only",))
    def train_step(state, low, high, recon_only: bool):
        def loss_fn(params):
            q1_low, q2_low = net.apply({"params": params}, low)
            q1_high, q2_high = net.apply({"params": params}, high)
            if recon_only:
                loss = criterion.recon_only(q1_low, q2_low, low, q1_high, q2_high, high)
                return loss, {"loss": loss}
            losses = criterion(q1_low, q2_low, low, q1_high, q2_high, high)
            return losses["loss_Decom"], {"loss": losses["loss_Decom"],
                                          "recon_low": losses["recon_loss_low"],
                                          "freq": losses.get("freq_loss", 0.0)}

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), aux

    @jax.jit
    def recon_metrics(params, img):
        q1, q2 = net.apply({"params": params}, img)
        recon = jnp.clip(hamilton_product(q1, q2)[..., 1:], 0.0, 1.0)
        return (calculate_psnr_jax(recon, img).mean(),
                calculate_ssim_jax(recon, img).mean())

    os.makedirs(out_dir, exist_ok=True)
    history = []
    val_set = None
    if val_low_dir and val_high_dir:
        val_set = PairDataset(val_low_dir, val_high_dir, train=False)

    for epoch in range(epochs):
        loader.set_epoch(epoch)
        t0 = time.time()
        ep_losses = []
        for i, batch in enumerate(loader):
            state, aux = train_step(
                state, jnp.asarray(batch["low"]), jnp.asarray(batch["high"]),
                recon_only=epoch < recon_only_epochs,
            )
            ep_losses.append(float(aux["loss"]))
            if i % log_every == 0:
                logger.info(
                    f"epoch {epoch} step {int(state.step)} loss {float(aux['loss']):.4f}"
                )
        rec = {"epoch": epoch, "loss": float(np.mean(ep_losses))}
        # per-epoch validation: reconstruction fidelity (train2.py:292-318)
        if val_set is not None:
            psnrs, ssims = [], []
            for k in range(len(val_set)):
                s = val_set[k]
                img = jnp.asarray(s["low"][None])
                h, w = img.shape[1] // 2 * 2, img.shape[2] // 2 * 2
                p, ss = recon_metrics(state.params, img[:, :h, :w])
                psnrs.append(float(p))
                ssims.append(float(ss))
            logger.info(
                f"epoch {epoch}: recon PSNR {np.mean(psnrs):.2f} SSIM {np.mean(ssims):.4f} "
                f"({time.time()-t0:.1f}s)"
            )
            rec["recon_psnr"] = float(np.mean(psnrs))
            rec["recon_ssim"] = float(np.mean(ssims))
        history.append(rec)
        with open(os.path.join(out_dir, "history.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
        if (epoch + 1) % save_every == 0 or epoch == epochs - 1:
            with open(os.path.join(out_dir, f"{model_type}_{epoch}.msgpack"), "wb") as f:
                f.write(serialization.msgpack_serialize(jax.device_get(state.params)))
    return state, history


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_type", default="model4",
                   choices=["model1", "model2", "model3", "model4"])
    p.add_argument("--low_dir", required=True)
    p.add_argument("--high_dir", required=True)
    p.add_argument("--val_low_dir")
    p.add_argument("--val_high_dir")
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--patch_size", type=int, default=256)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--out_dir", default="experiments/qd")
    args = p.parse_args()
    train_qd(**vars(args))


if __name__ == "__main__":
    main()
