"""ConditionGenerator — the Stage-I (Bayesian) trainer.

Parity: basicsr/models/condition_generator_model.py:28-264. The network is
built with ``bayesian=True`` (the TPU-native convert2bnn_selective,
condition_generator_model.py:51-59); each train step samples weights via the
``bayes`` rng stream, EMA-updates the prior (decay 0.998, conv.py:91-104)
and adds ``0.01 * KL / batch`` to the loss (:184-189). Validation runs the
deterministic path by simply not passing the rng (:243-258).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..bayesian import get_kl_loss, update_prior_ema
from ..losses import build_loss
from ..metrics import calculate_metric
from ..utils.img_util import imwrite, tensor2img
from ..utils.registry import MODEL_REGISTRY
from .base_model import BaseModel


@MODEL_REGISTRY.register()
class ConditionGenerator(BaseModel):
    def __init__(self, opt):
        # force the bayesian flag into the arch config (selective conversion:
        # only VSS-block innards become stochastic, tools.py:48-51)
        opt = dict(opt)
        network_g = dict(opt["network_g"])
        if opt.get("selective", True):
            network_g["bayesian"] = True
        else:
            network_g["bayesian"] = True  # full conversion == same flag here
        network_g.setdefault("sigma_init", opt.get("sigma_init", 0.05))
        opt["network_g"] = network_g
        super().__init__(opt)
        self.bnn_decay = 0.998
        cond = opt.get("condition", {})
        self.cond_type = cond.get("type", "mean")
        if self.is_train:
            train_opt = opt["train"]
            self.cri_pix = build_loss(train_opt["pixel_opt"]) if train_opt.get("pixel_opt") else None
            if self.cri_pix is None:
                raise ValueError("pixel loss required for ConditionGenerator")
            self.kl_batch = opt["datasets"]["train"].get("mini_batch_sizes", [8])[0]
            self.mixing_flag = train_opt.get("mixing_augs", {}).get("mixup", False)
            self.mixup_beta = train_opt.get("mixing_augs", {}).get("mixup_beta", 1.2)

    def _keys(self):
        if self.cond_type == "histogram":
            return "hist_lq", "hist_gt"
        return "lq_down", "gt_down"

    def _init_variables(self, rng, batch):
        lq_key, _ = self._keys()
        params_rng, bayes_rng = jax.random.split(rng)
        return self.net.init(
            {"params": params_rng, "bayes": bayes_rng}, jnp.asarray(batch[lq_key])
        )

    # --------------------------------------------------------------- train
    def _train_step(self, state, batch, use_mask: bool):
        rng, bayes_rng, mix_rng = jax.random.split(state.rng, 3)
        lq_key, gt_key = self._keys()
        lq, gt = batch[lq_key], batch[gt_key]
        if self.mixing_flag:
            lam = jax.random.beta(mix_rng, self.mixup_beta, self.mixup_beta)
            gt = lam * gt + (1 - lam) * jnp.flip(gt, axis=0)
            lq = lam * lq + (1 - lam) * jnp.flip(lq, axis=0)
        mask = batch.get("mask") if use_mask else None

        # EMA prior update BEFORE sampling, with pre-update params
        # (conv.py:91-104: runs at the top of every stochastic training fwd)
        bayes_prior = update_prior_ema(
            state.bayes_prior, self._bayes_subtree(state.params, state.bayes_prior),
            state.step, self.bnn_decay,
        )

        def loss_fn(params):
            preds = self.net.apply(
                {"params": params}, lq, mask, rngs={"bayes": bayes_rng}
            )[-1]
            aux = {}
            l_kl = get_kl_loss(params, jax.lax.stop_gradient(bayes_prior))
            aux["l_kl"] = l_kl
            total = 0.01 * l_kl / self.kl_batch
            l_pix = self.cri_pix(preds, gt)
            total = total + l_pix
            aux["l_pix"] = l_pix / self.opt["train"]["pixel_opt"].get("loss_weight", 1)
            aux["l_total"] = total
            return total, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state, aux = self._apply_updates(
            state.replace(rng=rng, bayes_prior=bayes_prior), grads, aux
        )
        return state, aux

    @staticmethod
    def _bayes_subtree(params, prior):
        """Params restricted to the prior's tree structure (same paths)."""
        from flax import traverse_util

        pflat = traverse_util.flatten_dict(params)
        return traverse_util.unflatten_dict(
            {k: pflat[k] for k in traverse_util.flatten_dict(prior)}
        )

    # --------------------------------------------------------------- eval
    _fwd = None

    def nonpad_test(self, lq):
        """Deterministic forward — no bayes rng == mean weights
        (condition_generator_model.py:243-258)."""
        if self._fwd is None:
            self._fwd = jax.jit(
                lambda params, x: self.net.apply({"params": params}, x)[-1]
            )
        params = self.state.ema_params if self.state.ema_params is not None else self.state.params
        return self._fwd(params, lq)

    def sample(self, lq, key, num_samples: int = 1):
        """K stochastic forwards as one vmapped batch (the reference's
        Python loop over re-sampled weights, eval.py:199-211)."""
        params = self.state.params
        keys = jax.random.split(key, num_samples)
        return jax.vmap(
            lambda k: self.net.apply({"params": params}, lq, rngs={"bayes": k})[-1]
        )(keys)

    def pad_test(self, lq, window_size):
        h, w = lq.shape[1], lq.shape[2]
        ph = (window_size - h % window_size) % window_size
        pw = (window_size - w % window_size) % window_size
        img = jnp.pad(lq, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        out = self.nonpad_test(img)
        return out[:, :h, :w, :]

    def nondist_validation(self, dataloader, current_iter, tb_logger=None,
                           save_img=False, rgb2bgr=True, use_image=True):
        dataset_name = dataloader.dataset.opt["name"]
        metrics_opt = self.opt["val"].get("metrics")
        self.metric_results = {m: 0.0 for m in (metrics_opt or {})}
        window_size = self.opt["val"].get("window_size", 0)
        lq_key, gt_key = self._keys()
        cnt = 0
        for val_data in dataloader:
            lq = jnp.asarray(val_data[lq_key])
            if window_size:
                output = self.pad_test(lq, window_size)
            else:
                output = self.nonpad_test(lq)
            sr_img = tensor2img(np.asarray(output[0]), rgb2bgr=rgb2bgr)
            gt_img = None
            if gt_key in val_data:
                gt_img = tensor2img(np.asarray(val_data[gt_key][0]), rgb2bgr=rgb2bgr)
            if save_img and self.cond_type != "histogram":
                name = os.path.splitext(os.path.basename(val_data["lq_path"][0]))[0]
                vis = self.opt["path"].get("visualization", ".")
                imwrite(sr_img, os.path.join(vis, name, f"{name}.png"))
            if metrics_opt and gt_img is not None:
                for mname, mopt in metrics_opt.items():
                    self.metric_results[mname] += calculate_metric(
                        {"img": sr_img, "img2": gt_img}, mopt
                    )
            cnt += 1
        for m in self.metric_results:
            self.metric_results[m] /= max(cnt, 1)
        log_str = f"Validation {dataset_name},\t"
        for metric, value in self.metric_results.items():
            log_str += f"\t # {metric}: {value:.4f}"
        self.logger.info(log_str)
        if tb_logger:
            for metric, value in self.metric_results.items():
                tb_logger.add_scalar(f"metrics/{metric}", value, current_iter)
        return self.metric_results.get("psnr", 0.0)
