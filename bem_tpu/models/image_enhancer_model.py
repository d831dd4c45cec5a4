"""ImageEnhancer — the Stage-II trainer.

Parity: basicsr/models/image_enhancer_model.py:27-380. The optimize step is
one jitted pure function: condition noise + bilinear x16 upsample + concat
(reference feed_train_data :133-148 and optimize_parameters :165-216) fuse
into the forward; grads are clipped and applied by the optax chain; EMA and
logging happen in the same step. bf16 autocast (use_amp) maps to bf16 compute
dtype with fp32 params and fp32 scan carry — no GradScaler needed on TPU.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..losses import build_loss
from ..metrics import calculate_metric
from ..ops.resize import resize_bilinear
from ..utils.img_util import imwrite, tensor2img
from ..utils.registry import MODEL_REGISTRY
from .base_model import BaseModel


@MODEL_REGISTRY.register()
class ImageEnhancer(BaseModel):
    def __init__(self, opt):
        super().__init__(opt)
        cond = opt.get("condition", {})
        self.cond_type = cond.get("type", "mean")
        self.noise_level = cond.get("noise_level", 0)
        self.scale_factor = cond.get("scale_down", 0) + cond.get("hist_patch_size", 0)
        if self.is_train:
            train_opt = opt["train"]
            self.cri_pix = build_loss(train_opt["pixel_opt"]) if train_opt.get("pixel_opt") else None
            self.cri_perceptual = None
            if train_opt.get("perceptual_opt"):
                from ..losses.perceptual import build_perceptual

                self.cri_perceptual = build_perceptual(train_opt["perceptual_opt"])
            if self.cri_pix is None and self.cri_perceptual is None:
                raise ValueError("Both pixel and perceptual losses are None.")
            self.mixing_flag = train_opt.get("mixing_augs", {}).get("mixup", False)
            self.mixup_beta = train_opt.get("mixing_augs", {}).get("mixup_beta", 1.2)
            self.use_identity = train_opt.get("mixing_augs", {}).get("use_identity", False)

    # --------------------------------------------------------------- init
    def _cond_key(self, batch):
        return "hist_gt" if self.cond_type == "histogram" else "gt_down"

    def _init_variables(self, rng, batch):
        inp = self._build_input(batch["lq"], batch[self._cond_key(batch)])
        return self.net.init(rng, inp)

    def _build_input(self, lq, conds):
        up = resize_bilinear(conds, size=(lq.shape[1], lq.shape[2]))
        return jnp.concatenate([lq, up], axis=-1)

    # --------------------------------------------------------------- train
    def _train_step(self, state, batch, use_mask: bool):
        rng, noise_rng, mix_rng = jax.random.split(state.rng, 3)
        lq, gt = batch["lq"], batch["gt"]
        conds = batch[self._cond_key(batch)]
        conds = conds + self.noise_level * jax.random.normal(noise_rng, conds.shape, conds.dtype)
        if self.mixing_flag:
            lam = jax.random.beta(mix_rng, self.mixup_beta, self.mixup_beta)
            gt = lam * gt + (1 - lam) * jnp.flip(gt, axis=0)
            lq = lam * lq + (1 - lam) * jnp.flip(lq, axis=0)
        inp = self._build_input(lq, conds)
        mask = batch.get("mask") if use_mask else None

        def loss_fn(params):
            preds = self.net.apply({"params": params}, inp, mask)[-1]
            aux = {}
            total = 0.0
            if self.cri_pix is not None:
                l_pix = self.cri_pix(preds, gt)
                total = total + l_pix
                aux["l_pix"] = l_pix / self.opt["train"]["pixel_opt"].get("loss_weight", 1)
            if self.cri_perceptual is not None:
                l_percep, l_style = self.cri_perceptual(preds, gt)
                if l_percep is not None:
                    total = total + l_percep
                    aux["l_percep"] = l_percep / self.opt["train"]["perceptual_opt"].get(
                        "perceptual_weight", 1
                    )
                if l_style is not None:
                    total = total + l_style
            aux["l_total"] = total
            # first sample of the train batch for the periodic visual dump
            # (reference image_enhancer_model.py:193-197); non-scalar keys
            # are stripped from the scalar logs by BaseModel.train_step
            aux["_visual_pred"] = jnp.clip(preds[0], 0.0, 1.0)
            aux["_visual_gt"] = gt[0]
            return total, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state, aux = self._apply_updates(state.replace(rng=rng), grads, aux)
        return state, aux

    # --------------------------------------------------------------- eval
    def _eval_params(self):
        return self.state.ema_params if self.state.ema_params is not None else self.state.params

    def nonpad_test(self, lq, conds):
        """Deterministic forward with condition upsampled to the input size
        (image_enhancer_model.py:232-257)."""
        if self._fwd is None:
            self._fwd = jax.jit(
                lambda params, inp: self.net.apply({"params": params}, inp)[-1]
            )
        up = resize_bilinear(conds, size=(lq.shape[1], lq.shape[2]))
        inp = jnp.concatenate([lq, up], axis=-1)
        return self._fwd(self._eval_params(), inp)

    _fwd = None

    def pad_test(self, lq, conds, window_size):
        """Reflect-pad to a window multiple, forward, crop
        (image_enhancer_model.py:218-230)."""
        h, w = lq.shape[1], lq.shape[2]
        ph = (window_size - h % window_size) % window_size
        pw = (window_size - w % window_size) % window_size
        img = jnp.pad(lq, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        out = self.nonpad_test(img, conds)
        return out[:, :h, :w, :]

    def nondist_validation(self, dataloader, current_iter, tb_logger=None,
                           save_img=False, rgb2bgr=True, use_image=True):
        dataset_name = dataloader.dataset.opt["name"]
        metrics_opt = self.opt["val"].get("metrics")
        self.metric_results = {m: 0.0 for m in (metrics_opt or {})}
        window_size = self.opt["val"].get("window_size", 0)
        cnt = 0
        for val_data in dataloader:
            lq = jnp.asarray(val_data["lq"])
            conds = jnp.asarray(val_data[self._cond_key(val_data)])
            if window_size:
                output = self.pad_test(lq, conds, window_size)
            else:
                output = self.nonpad_test(lq, conds)
            sr_img = tensor2img(np.asarray(output[0]), rgb2bgr=rgb2bgr)
            gt_img = None
            if "gt" in val_data:
                gt_img = tensor2img(np.asarray(val_data["gt"][0]), rgb2bgr=rgb2bgr)
            if save_img:
                name = os.path.splitext(os.path.basename(val_data["lq_path"][0]))[0]
                vis = self.opt["path"].get("visualization", ".")
                imwrite(sr_img, os.path.join(vis, name, f"{name}.png"))
                if gt_img is not None:
                    imwrite(gt_img, os.path.join(vis, name, f"{name}_gt.png"))
            if metrics_opt and gt_img is not None:
                for mname, mopt in metrics_opt.items():
                    self.metric_results[mname] += calculate_metric(
                        {"img": sr_img, "img2": gt_img}, mopt
                    )
            cnt += 1
        for m in self.metric_results:
            self.metric_results[m] /= max(cnt, 1)
        self._log_validation_metric_values(current_iter, dataset_name, tb_logger)
        return self.metric_results.get("psnr", 0.0)

    def _log_validation_metric_values(self, current_iter, dataset_name, tb_logger):
        log_str = f"Validation {dataset_name},\t"
        for metric, value in self.metric_results.items():
            log_str += f"\t # {metric}: {value:.4f}"
        self.logger.info(log_str)
        if tb_logger:
            for metric, value in self.metric_results.items():
                tb_logger.add_scalar(f"metrics/{metric}", value, current_iter)
