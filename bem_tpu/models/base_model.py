"""Base trainer: functional TrainState + optimizer/scheduler/EMA/ckpt plumbing.

TPU-native rebuild of BaseModel (basicsr/models/base_model.py:13-421):
- device placement + DDP wrap (base_model.py:89-103) becomes a
  ``jax.sharding.Mesh`` with the batch sharded over the ``data`` axis and
  params replicated; gradient averaging is XLA's psum inside jit — no NCCL.
- optimizers/schedulers (base_model.py:105-161) are one optax chain
  (global-norm clip -> AdamW with the schedule as learning_rate fn).
- EMA (base_model.py:77-84) is an extra param tree updated in the train step.
- save/resume (base_model.py:236-394) via utils.checkpoint.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..archs import build_network
from ..utils import checkpoint as ckpt
from ..utils.logger import get_root_logger
from .lr_scheduler import build_schedule, with_warmup


def _arrays_only(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Drop non-array entries (path strings) before handing a batch to jit."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)) and getattr(v, "dtype", None) != object:
            out[k] = v
    return out


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array
    ema_params: Any = None
    bayes_prior: Any = None


class BaseModel:
    """Shared trainer skeleton; subclasses define loss_and_aux / feed logic."""

    def __init__(self, opt: Dict[str, Any]):
        self.opt = opt
        self.is_train = opt.get("is_train", False)
        self.logger = get_root_logger()
        self.net = build_network(opt["network_g"])
        self.state: Optional[TrainState] = None
        self.best_metric = None
        self._train_step_fn = None
        self.metric_results: Dict[str, float] = {}

    # ------------------------------------------------------------------ setup
    def _build_optimizer(self, params=None):
        train_opt = self.opt["train"]
        optim_opt = dict(train_opt["optim_g"])
        optim_type = optim_opt.pop("type")
        base_lr = optim_opt.pop("lr")
        betas = optim_opt.pop("betas", (0.9, 0.999))
        wd = optim_opt.pop("weight_decay", 0.0)

        schedulers = train_opt.get("scheduler")
        if schedulers:
            schedule = build_schedule(base_lr, schedulers)
        else:
            schedule = lambda step: base_lr
        warmup = train_opt.get("warmup_iter", -1)
        schedule = with_warmup(schedule, warmup, base_lr)
        self.lr_schedule = schedule

        if optim_type == "AdamW":
            opt_core = optax.adamw(schedule, b1=betas[0], b2=betas[1], weight_decay=wd)
        elif optim_type == "Adam":
            opt_core = optax.adam(schedule, b1=betas[0], b2=betas[1])
        else:
            raise NotImplementedError(f"optimizer {optim_type} is not supported yet.")

        chain = []
        max_norm = train_opt.get("max_grad_norm", 0)
        if max_norm:
            chain.append(optax.clip_by_global_norm(max_norm))
        chain.append(opt_core)
        self.tx = optax.chain(*chain)

        # freeze embedded subtrees (e.g. the QD decomp the reference loads
        # frozen at build time) — masks both updates AND AdamW weight decay
        frozen = getattr(self.net, "frozen_subtrees", None)
        if frozen is not None and params is not None:
            prefixes = frozen() if callable(frozen) else frozen

            def label(tree):
                return {
                    k: jax.tree.map(
                        lambda _: "frozen" if k in prefixes else "train", v
                    )
                    for k, v in tree.items()
                }

            self.tx = optax.multi_transform(
                {"train": self.tx, "frozen": optax.set_to_zero()}, label(params)
            )
        self.ema_decay = train_opt.get("ema_decay", 0)

    def init_state(self, example_batch: Dict[str, np.ndarray], seed: int = 0):
        """Initialize params + optimizer state from an example batch."""
        # legacy uint32 keys: they serialize in checkpoints (typed keys don't)
        rng = jax.random.PRNGKey(seed)
        init_rng, state_rng = jax.random.split(rng)
        variables = jax.jit(self._init_variables)(init_rng, _arrays_only(example_batch))
        params = variables["params"]
        if hasattr(self.net, "load_frozen"):
            params = jax.tree.map(jnp.asarray, self.net.load_frozen(params))
        from ..bayesian import extract_bayes_prior

        bayes_prior = extract_bayes_prior(params)
        if self.is_train:
            self._build_optimizer(params)
            opt_state = self.tx.init(params)
        else:
            opt_state = None
            self.ema_decay = 0
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            rng=state_rng,
            ema_params=params if getattr(self, "ema_decay", 0) > 0 else None,
            bayes_prior=bayes_prior,
        )
        n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
        self.logger.info(
            f"Network [{type(self.net).__name__}] initialized: {n_params/1e6:.3f} M params."
        )
        return self.state

    def _init_variables(self, rng, example_batch):
        raise NotImplementedError

    # ------------------------------------------------------------------ train
    def train_step(self, batch: Dict[str, np.ndarray]) -> Dict[str, float]:
        if self._train_step_fn is None:
            self._train_step_fn = jax.jit(self._train_step, static_argnames=("use_mask",))
        use_mask = self._use_mask(batch)
        self.state, logs = self._train_step_fn(
            self.state, _arrays_only(batch), use_mask=use_mask
        )
        # non-scalar aux entries (train-batch visuals) are kept aside for
        # the driver's periodic dump, not logged as scalars
        self.last_visuals = {
            k[len("_visual_"):]: v for k, v in logs.items()
            if k.startswith("_visual_")
        }
        return {k: v for k, v in logs.items() if not k.startswith("_visual_")}

    def _use_mask(self, batch) -> bool:
        # MIM mask is disabled after the first scheduler period
        # (image_enhancer_model.py:169-170)
        if "mask" not in batch:
            return False
        periods = self.opt["train"].get("scheduler", {}).get("periods")
        if periods and int(self.state.step) > periods[0]:
            return False
        return True

    def _train_step(self, state, batch, use_mask: bool):
        raise NotImplementedError

    def sigma_logs(self) -> Dict[str, float]:
        """Per-parameter BNN posterior sigma means, sigma = softplus(rho)
        (reference train.py:200-205 'vars/<name>|sigma' tensorboard dump).
        Empty for non-Bayesian models."""
        from jax.tree_util import tree_flatten_with_path

        out = {}
        leaves, _ = tree_flatten_with_path(self.state.params)
        for path, v in leaves:
            keys = [str(getattr(k, "key", k)) for k in path]
            if any(k.startswith("rho_") for k in keys):
                tag = "|".join(keys).replace("rho_", "sigma_")
                out[f"vars/{tag}"] = float(
                    jnp.mean(jnp.abs(jax.nn.softplus(v))))
        return out

    def _apply_updates(self, state, grads, aux):
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = state.ema_params
        if self.ema_decay > 0 and ema_params is not None:
            d = self.ema_decay
            ema_params = jax.tree.map(lambda e, p: d * e + (1 - d) * p, ema_params, params)
        aux["grad_norm"] = optax.global_norm(grads)
        aux["lr"] = self.lr_schedule(state.step)
        if self.opt.get("logger", {}).get("record_grad", False):
            # per-parameter |grad| means (reference train.py:186-195 dumps
            # grads/<name> scalars to tensorboard when record_grad)
            from jax.tree_util import tree_flatten_with_path

            leaves, _ = tree_flatten_with_path(grads)
            for path, g in leaves:
                tag = "|".join(str(getattr(k, "key", k)) for k in path)
                aux[f"grads/{tag}"] = jnp.mean(jnp.abs(g))
        return state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
        ), aux

    # ------------------------------------------------------------------- ckpt
    def _paths(self):
        root = self.opt["path"]["experiments_root"]
        return os.path.join(root, "models"), os.path.join(root, "training_states")

    def save(self, epoch: int, current_iter: int, **kwargs):
        mdir, sdir = self._paths()
        extra = {}
        if self.state.ema_params is not None:
            extra["params_ema"] = self.state.ema_params
        ckpt.save_params(
            os.path.join(mdir, f"net_g_{current_iter}.msgpack"),
            self.state.params,
            extra=extra,
        )
        ckpt.save_state(os.path.join(sdir, f"{current_iter}.state"), self.state)

    def save_best(self, best_metric: Dict[str, Any], param_key: str = "params"):
        """best_psnr_{psnr:.2f}_{iter} file, older best removed
        (image_enhancer_model.py:352-380)."""
        import glob

        psnr = best_metric["psnr"]
        cur_iter = best_metric["iter"]
        root = self.opt["path"]["experiments_root"]
        path = os.path.join(root, f"best_psnr_{psnr:.2f}_{cur_iter}.msgpack")
        if not os.path.exists(path):
            for f in glob.glob(os.path.join(root, "best_*")):
                os.remove(f)
            ckpt.save_params(path, self.state.params, param_key)

    def resume_training(self, state_path: str):
        self.state = ckpt.load_state(state_path, self.state)
        self.logger.info(f"Resumed training from {state_path} (iter {int(self.state.step)}).")

    def load_network(self, load_path: str, strict: bool = True, param_key: str = "params"):
        params = ckpt.load_params(load_path, param_key)
        # key/shape check of every leaf (reference _print_different_keys_loading
        # + size-mismatch filtering, base_model.py:282-343)
        ref = {
            jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_leaves_with_path(self.state.params)
        }
        new = {
            jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_leaves_with_path(params)
        }
        missing = sorted(set(ref) - set(new))
        unexpected = sorted(set(new) - set(ref))
        mismatched = sorted(
            k for k in set(ref) & set(new) if tuple(ref[k]) != tuple(new[k])
        )
        for k in missing:
            self.logger.warning(f"load_network: missing key {k}")
        for k in unexpected:
            self.logger.warning(f"load_network: unexpected key {k}")
        for k in mismatched:
            self.logger.warning(
                f"load_network: size mismatch {k}: model {ref[k]} vs ckpt {new[k]}"
            )
        if strict and (missing or unexpected or mismatched):
            raise ValueError(
                f"load_network(strict=True) from {load_path}: "
                f"{len(missing)} missing, {len(unexpected)} unexpected, "
                f"{len(mismatched)} size-mismatched keys (see log)."
            )
        if not strict and (missing or unexpected or mismatched):
            # non-strict: keep the current value for absent/mismatched leaves
            # (reference pops size-mismatched keys before load_state_dict)
            merged = jax.tree_util.tree_map_with_path(
                lambda p, cur: (
                    self._leaf_from(params, p)
                    if jax.tree_util.keystr(p) in new
                    and tuple(new[jax.tree_util.keystr(p)]) == tuple(cur.shape)
                    else cur
                ),
                self.state.params,
            )
            params = merged
        self.state = self.state.replace(params=params)
        self.logger.info(f"Loaded network weights from {load_path} [{param_key}].")

    @staticmethod
    def _leaf_from(tree, path):
        for k in path:
            tree = tree[k.key if hasattr(k, "key") else k.idx]
        return tree

    # ------------------------------------------------------------------- misc
    def get_current_log(self):
        return getattr(self, "log_dict", {})

    def validation(self, dataloader, current_iter, tb_logger=None, save_img=False,
                   rgb2bgr=True, use_image=True):
        # single-process equivalent of rank-0-only validation
        # (image_enhancer_model.py:259-263)
        if jax.process_index() != 0:
            return 0.0
        return self.nondist_validation(
            dataloader, current_iter, tb_logger, save_img, rgb2bgr, use_image
        )

    def nondist_validation(self, *args, **kwargs):
        raise NotImplementedError
