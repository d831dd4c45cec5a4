"""LR schedules as pure ``step -> lr`` functions (optax-compatible).

Parity: basicsr/models/lr_scheduler.py — MultiStepRestartLR:7, LinearLR:49,
VibrateLR:72, CosineAnnealingRestartLR:136, CosineAnnealingRestartCyclicLR:186
(the one all BEM configs use, with per-period eta_mins). Implemented with
jnp so schedules are traceable inside a jitted train step; warmup matching
BaseModel.update_learning_rate (base_model.py:209-230) is composed on top.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def _cumsum(periods):
    return np.cumsum(np.asarray(periods)).tolist()


def cosine_annealing_restart_cyclic_lr(
    base_lr: float,
    periods: Sequence[int],
    restart_weights: Sequence[float] = (1,),
    eta_mins: Sequence[float] = (0,),
):
    assert len(periods) == len(restart_weights) == len(eta_mins)
    cum = np.asarray(_cumsum(periods), np.float32)
    periods = np.asarray(periods, np.float32)
    weights = np.asarray(restart_weights, np.float32)
    etas = np.asarray(eta_mins, np.float32)
    starts = np.concatenate([[0.0], cum[:-1]])

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        # right-closest period index (lr_scheduler.py:115-133: iteration <= cum)
        idx = jnp.sum(step > cum)
        idx = jnp.clip(idx, 0, len(periods) - 1)
        w = jnp.take(weights, idx)
        eta = jnp.take(etas, idx)
        t0 = jnp.take(starts, idx)
        T = jnp.take(periods, idx)
        return eta + w * 0.5 * (base_lr - eta) * (
            1.0 + jnp.cos(jnp.pi * (step - t0) / T)
        )

    return schedule


def cosine_annealing_restart_lr(
    base_lr: float,
    periods: Sequence[int],
    restart_weights: Sequence[float] = (1,),
    eta_min: float = 0.0,
):
    return cosine_annealing_restart_cyclic_lr(
        base_lr, periods, restart_weights, [eta_min] * len(periods)
    )


def multi_step_restart_lr(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float = 0.1,
    restarts: Sequence[int] = (0,),
    restart_weights: Sequence[float] = (1,),
):
    milestones = np.asarray(sorted(milestones), np.float32)
    restarts = np.asarray(restarts, np.float32)
    r_weights = np.asarray(restart_weights, np.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        n_decays = jnp.sum(step >= milestones)
        lr = base_lr * gamma**n_decays
        # restart weight of the most recent restart <= step
        idx = jnp.clip(jnp.sum(step >= restarts) - 1, 0, len(r_weights) - 1)
        last_restart = jnp.take(restarts, idx)
        w = jnp.take(r_weights, idx)
        decays_since = jnp.sum((milestones > last_restart) & (step >= milestones))
        return base_lr * w * gamma**decays_since

    return schedule


def linear_lr(base_lr: float, total_iter: int):
    def schedule(step):
        return base_lr * (1.0 - jnp.asarray(step, jnp.float32) / total_iter)

    return schedule


def vibrate_lr(base_lr: float, total_iter: int):
    T = total_iter // 80
    Th = T // 2

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        process = step / total_iter
        f = jnp.where(
            process < 3 / 8, 1.0 - process * 8 / 3, jnp.where(process < 5 / 8, 0.2, 0.1)
        )
        t = jnp.mod(step, T)
        f2 = t / Th
        f2 = jnp.where(t >= Th, 2.0 - f2, f2)
        w = f * f2
        w = jnp.where(step < Th, jnp.maximum(0.1, w), w)
        return base_lr * w

    return schedule


def with_warmup(schedule, warmup_iter: int, base_lr: float):
    """Linear warmup override for iter < warmup_iter (base_model.py:209-230)."""
    if warmup_iter <= 0:
        return schedule

    def warmed(step):
        step_f = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step_f + 1.0) / warmup_iter
        return jnp.where(step_f < warmup_iter, warm, schedule(step))

    return warmed


_SCHEDULES = {
    "CosineAnnealingRestartCyclicLR": lambda lr, opt: cosine_annealing_restart_cyclic_lr(
        lr, opt["periods"], opt.get("restart_weights", (1,)), opt.get("eta_mins", (0,))
    ),
    "CosineAnnealingRestartLR": lambda lr, opt: cosine_annealing_restart_lr(
        lr, opt["periods"], opt.get("restart_weights", (1,)), opt.get("eta_min", 0.0)
    ),
    "MultiStepLR": lambda lr, opt: multi_step_restart_lr(
        lr, opt["milestones"], opt.get("gamma", 0.1)
    ),
    "MultiStepRestartLR": lambda lr, opt: multi_step_restart_lr(
        lr,
        opt["milestones"],
        opt.get("gamma", 0.1),
        opt.get("restarts", (0,)),
        opt.get("restart_weights", (1,)),
    ),
    "LinearLR": lambda lr, opt: linear_lr(lr, opt["total_iter"]),
    "VibrateLR": lambda lr, opt: vibrate_lr(lr, opt["total_iter"]),
    "TrueCosineAnnealingLR": lambda lr, opt: cosine_annealing_restart_lr(
        lr, [opt["T_max"]], (1,), opt.get("eta_min", 0.0)
    ),
}


def build_schedule(base_lr: float, scheduler_opt: dict):
    opt = dict(scheduler_opt)
    stype = opt.pop("type")
    if stype not in _SCHEDULES:
        raise NotImplementedError(f"Scheduler {stype} is not implemented")
    return _SCHEDULES[stype](base_lr, opt)
