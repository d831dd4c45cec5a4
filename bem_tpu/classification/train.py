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


# ---------------------------------------------------------------------------
# Config-driven entry (vmamba/main.py:50-104 parse_option + main:106-199)
# ---------------------------------------------------------------------------


def build_model_from_config(config) -> VSSM:
    """MODEL.VSSM config subtree -> VSSM (vmamba/models/__init__.py
    build_vssm_model field mapping)."""
    v = config.MODEL.VSSM
    return VSSM(
        patch_size=v.PATCH_SIZE,
        in_chans=v.IN_CHANS,
        num_classes=config.MODEL.NUM_CLASSES,
        depths=tuple(v.DEPTHS),
        dims=v.EMBED_DIM,
        ssm_d_state=v.SSM_D_STATE,
        ssm_ratio=v.SSM_RATIO,
        ssm_dt_rank=v.SSM_DT_RANK,
        ssm_conv=v.SSM_CONV,
        ssm_conv_bias=v.SSM_CONV_BIAS,
        ssm_drop_rate=v.SSM_DROP_RATE,
        ssm_init=v.SSM_INIT,
        forward_type=v.SSM_FORWARDTYPE,
        mlp_ratio=v.MLP_RATIO,
        mlp_drop_rate=v.MLP_DROP_RATE,
        gmlp=v.GMLP,
        drop_path_rate=config.MODEL.DROP_PATH_RATE,
        patch_norm=v.PATCH_NORM,
        downsample_version=v.DOWNSAMPLE,
        patchembed_version=v.PATCHEMBED,
        posembed=v.POSEMBED,
        imgsize=config.DATA.IMG_SIZE,
    )


def parse_option(args_list=None):
    import argparse

    p = argparse.ArgumentParser("VMamba classification", add_help=True)
    p.add_argument("--cfg", type=str, metavar="FILE",
                   help="path to config yaml")
    p.add_argument("--opts", nargs="+", default=None,
                   help="KEY VALUE override pairs")
    p.add_argument("--batch-size", dest="batch_size", type=int)
    p.add_argument("--data-path", dest="data_path", type=str)
    p.add_argument("--zip", action="store_true")
    p.add_argument("--cache-mode", dest="cache_mode", type=str)
    p.add_argument("--pretrained", type=str)
    p.add_argument("--resume", type=str)
    p.add_argument("--accumulation-steps", dest="accumulation_steps", type=int)
    p.add_argument("--use-checkpoint", dest="use_checkpoint",
                   action="store_true")
    p.add_argument("--disable_amp", action="store_true")
    p.add_argument("--output", type=str)
    p.add_argument("--tag", type=str)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--throughput", action="store_true")
    args = p.parse_args(args_list)

    from .config import get_config

    return args, get_config(args)


def main(args_list=None):
    args, config = parse_option(args_list)
    logger = get_root_logger()

    model = build_model_from_config(config)
    if config.THROUGHPUT_MODE:
        ips = throughput(model, batch=config.DATA.BATCH_SIZE,
                         size=config.DATA.IMG_SIZE)
        logger.info(f"throughput: {ips:.1f} images/s")
        return ips

    from .data import build_loader

    _, _, loader_train, loader_val, _ = build_loader(config)
    steps_per_epoch = max(len(loader_train), 1)
    example = np.zeros(
        (1, config.DATA.IMG_SIZE, config.DATA.IMG_SIZE, 3), np.float32)
    state, train_step, eval_step = make_trainer(
        model, example,
        total_steps=config.TRAIN.EPOCHS * steps_per_epoch,
        base_lr=config.TRAIN.BASE_LR,
        warmup_steps=config.TRAIN.WARMUP_EPOCHS * steps_per_epoch,
        weight_decay=config.TRAIN.WEIGHT_DECAY,
        label_smoothing=config.MODEL.LABEL_SMOOTHING,
        seed=config.SEED,
    )
    if config.EVAL_MODE:
        t1, t5 = validate(state.params, eval_step, loader_val)
        logger.info(f"eval top1 {t1:.4f} top5 {t5:.4f}")
        return t1, t5
    for epoch in range(config.TRAIN.START_EPOCH, config.TRAIN.EPOCHS):
        loader_train.set_epoch(epoch)
        state, loss = train_one_epoch(state, train_step, loader_train)
        t1, t5 = validate(state.params, eval_step, loader_val)
        logger.info(
            f"epoch {epoch}: loss {loss:.4f} top1 {t1:.4f} top5 {t5:.4f}")
    return state


if __name__ == "__main__":
    main()
