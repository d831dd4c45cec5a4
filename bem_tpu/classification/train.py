"""VMamba ImageNet-style classification harness.

Lean TPU-native equivalent of the reference's Swin-style harness
(basicsr/vmamba/main.py: train_one_epoch:226, validate:299, throughput:347,
yacs config tree): cross-entropy with label smoothing, AdamW + cosine
schedule with linear warmup, top-1/top-5 validation, throughput probe.
Dataset plumbing is a callable yielding (images NHWC [0,1], labels) numpy
batches — ImageNet loaders plug in at that boundary.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..nn.vssm import VSSM, vmamba_tiny
from ..utils.logger import get_root_logger


class ClsTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array


def cross_entropy(logits, labels, smoothing: float = 0.1):
    n = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, n)
    soft = onehot * (1 - smoothing) + smoothing / n
    return -jnp.mean(jnp.sum(soft * jax.nn.log_softmax(logits), axis=-1))


def make_trainer(model: VSSM, example: np.ndarray, total_steps: int,
                 base_lr: float = 1e-3, warmup_steps: int = 0,
                 weight_decay: float = 0.05, label_smoothing: float = 0.1,
                 seed: int = 0):
    rng = jax.random.PRNGKey(seed)
    params = jax.jit(model.init)(rng, jnp.asarray(example))["params"]
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, base_lr, max(warmup_steps, 1), max(total_steps, 2)
    )
    tx = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adamw(schedule, weight_decay=weight_decay),
    )
    state = ClsTrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=tx.init(params), rng=rng)

    @jax.jit
    def train_step(state, images, labels):
        rng, drop_rng = jax.random.split(state.rng)

        def loss_fn(p):
            logits = model.apply({"params": p}, images,
                                 rngs={"dropout": drop_rng})
            return cross_entropy(logits, labels, label_smoothing)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, rng=rng), loss

    @jax.jit
    def eval_step(params, images, labels):
        logits = model.apply({"params": params}, images)
        top1 = jnp.mean(jnp.argmax(logits, -1) == labels)
        top5 = jnp.mean(
            jnp.any(jnp.argsort(logits, -1)[:, -5:] == labels[:, None], axis=-1)
        )
        return top1, top5

    return state, train_step, eval_step


def train_one_epoch(state, train_step, loader: Iterable, log_every: int = 50):
    logger = get_root_logger()
    losses = []
    for i, (images, labels) in enumerate(loader):
        state, loss = train_step(state, jnp.asarray(images), jnp.asarray(labels))
        losses.append(float(loss))
        if i % log_every == 0:
            logger.info(f"step {int(state.step)} loss {losses[-1]:.4f}")
    return state, float(np.mean(losses))


def validate(params, eval_step, loader: Iterable):
    t1s, t5s = [], []
    for images, labels in loader:
        t1, t5 = eval_step(params, jnp.asarray(images), jnp.asarray(labels))
        t1s.append(float(t1))
        t5s.append(float(t5))
    return float(np.mean(t1s)), float(np.mean(t5s))


def throughput(model: VSSM, batch: int = 64, size: int = 224, iters: int = 10):
    """images/sec probe (vmamba/main.py:347)."""
    x = jnp.asarray(np.random.default_rng(0).random((batch, size, size, 3)),
                    jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    f = jax.jit(lambda p, x: jnp.sum(model.apply({"params": p}, x)))
    float(f(params, x))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(params, x))
    return batch * iters / (time.perf_counter() - t0)
