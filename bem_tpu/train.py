"""Training driver (reference: basicsr/train.py:34-266).

python -m bem_tpu.train --opt Options/<cfg>.yml [--debug] [--auto_resume]
"""

from __future__ import annotations

import datetime
import logging
import math
import os
import time
from os import path as osp

import numpy as np

from .data import (
    CPUPrefetcher,
    DevicePrefetcher,
    EnlargedSampler,
    build_dataloader,
    build_dataset,
)
from .models import build_model
from .utils.checkpoint import find_latest_state
from .utils.img_util import imwrite, tensor2img
from .utils.logger import (
    AvgTimer,
    MessageLogger,
    get_root_logger,
    init_tb_logger,
    init_wandb_logger,
)
from .utils.misc import make_exp_dirs, mkdir_and_rename
from .utils.options import copy_opt_file, parse_options


def init_tb_loggers(opt):
    tb_logger = None
    if (opt["logger"].get("wandb") is not None
            and opt["logger"]["wandb"].get("project") is not None
            and "debug" not in opt["name"]):
        init_wandb_logger(opt)
    if opt["logger"].get("use_tb_logger") and "debug" not in opt["name"]:
        tb_logger = init_tb_logger(log_dir=osp.join(opt["root_path"], "tb_logger", opt["name"]))
    return tb_logger


def create_train_val_dataloader(opt, logger):
    """(train.py:34-71)."""
    train_loader, val_loaders = None, []
    total_epochs = total_iters = 0
    for phase, dataset_opt in opt["datasets"].items():
        if phase == "train":
            dataset_enlarge_ratio = dataset_opt.get("dataset_enlarge_ratio", 1)
            train_set = build_dataset(dataset_opt)
            train_sampler = EnlargedSampler(
                len(train_set), opt["world_size"], opt["rank"],
                dataset_enlarge_ratio, seed=opt.get("manual_seed") or 0,
            )
            train_loader = build_dataloader(
                train_set, dataset_opt, num_gpu=opt.get("num_gpu", 1),
                dist=opt["dist"], sampler=train_sampler, seed=opt["manual_seed"],
            )
            num_iter_per_epoch = math.ceil(
                len(train_set) * dataset_enlarge_ratio
                / (dataset_opt["batch_size_per_gpu"] * opt["world_size"])
            )
            total_iters = int(opt["train"]["total_iter"])
            total_epochs = math.ceil(total_iters / num_iter_per_epoch)
            logger.info(
                "Training statistics:"
                f"\n\tNumber of train images: {len(train_set)}"
                f"\n\tBatch size per gpu: {dataset_opt['batch_size_per_gpu']}"
                f"\n\tWorld size: {opt['world_size']}"
                f"\n\tRequire iter per epoch: {num_iter_per_epoch}"
                f"\n\tTotal epochs: {total_epochs}; iters: {total_iters}."
            )
        elif phase.split("_")[0] == "val":
            val_set = build_dataset(dataset_opt)
            val_loader = build_dataloader(
                val_set, dataset_opt, num_gpu=opt.get("num_gpu", 1),
                dist=opt["dist"], seed=opt["manual_seed"],
            )
            logger.info(f"Number of val images in {dataset_opt['name']}: {len(val_set)}")
            val_loaders.append(val_loader)
        else:
            raise ValueError(f"Dataset phase {phase} is not recognized.")
    return train_loader, train_sampler, val_loaders, total_epochs, total_iters


def train_pipeline(root_path, args_list=None):
    opt, args = parse_options(root_path, is_train=True, args_list=args_list)
    opt["root_path"] = root_path

    # auto resume (train.py:74-94)
    resume_state_path = None
    if opt.get("auto_resume"):
        resume_state_path = find_latest_state(opt["path"]["training_states"])
    elif opt["path"].get("resume_state"):
        resume_state_path = opt["path"]["resume_state"]

    if resume_state_path is None and opt["rank"] == 0:
        make_exp_dirs(opt)
        if (opt["logger"].get("use_tb_logger") and "debug" not in opt["name"]
                and opt["rank"] == 0):
            mkdir_and_rename(osp.join(opt["root_path"], "tb_logger", opt["name"]))
    if opt["rank"] == 0:
        copy_opt_file(args.opt, opt["path"]["experiments_root"])

    log_file = osp.join(opt["path"]["log"], f"train_{opt['name']}_{int(time.time())}.log")
    logger = get_root_logger(log_level=logging.INFO, log_file=log_file)
    tb_logger = init_tb_loggers(opt)

    result = create_train_val_dataloader(opt, logger)
    train_loader, train_sampler, val_loaders, total_epochs, total_iters = result

    # model + state
    model = build_model(opt)
    example_batch = next(iter(train_loader))
    model.init_state(example_batch, seed=opt["manual_seed"])
    start_epoch = current_iter = 0
    best_metric = {"iter": 0, "psnr": 0.0}
    if resume_state_path:
        model.resume_training(resume_state_path)
        current_iter = int(model.state.step)
        start_epoch = current_iter // max(len(train_loader), 1)
        logger.info(f"Resuming training from epoch: {start_epoch}, iter: {current_iter}.")

    msg_logger = MessageLogger(opt, current_iter, tb_logger)

    # dataloader prefetcher (train.py:153-162)
    prefetch_mode = opt["datasets"]["train"].get("prefetch_mode")
    if prefetch_mode == "device":
        prefetcher = DevicePrefetcher(train_loader)
    else:
        prefetcher = CPUPrefetcher(train_loader)

    logger.info(f"Start training from epoch: {start_epoch}, iter: {current_iter}")
    data_timer, iter_timer = AvgTimer(), AvgTimer()
    start_time = time.time()

    epoch = start_epoch
    while current_iter <= total_iters:
        train_loader.set_epoch(epoch)
        prefetcher.reset()
        train_data = prefetcher.next()

        while train_data is not None:
            data_timer.record()
            current_iter += 1
            if current_iter > total_iters:
                break

            log_vars = model.train_step(train_data)
            iter_timer.record()
            if current_iter == 1:
                msg_logger.reset_start_time()

            if current_iter % opt["logger"]["print_freq"] == 0:
                logs = {
                    "epoch": epoch,
                    "iter": current_iter,
                    "lrs": [float(log_vars.pop("lr", 0.0))],
                    "time": iter_timer.get_avg_time(),
                    "data_time": data_timer.get_avg_time(),
                }
                logs.update({k: float(v) for k, v in log_vars.items()})
                msg_logger(logs)
                # BNN posterior sigma tracking (reference train.py:200-205)
                if tb_logger is not None:
                    for tag, val in model.sigma_logs().items():
                        tb_logger.add_scalar(tag, val, current_iter)

            # periodic train-batch visual dump (reference
            # image_enhancer_model.py:193-197: train.png / train_gt.png)
            if (current_iter % 100 == 0
                    and getattr(model, "last_visuals", None)):
                vis_dir = opt["path"].get("visualization", ".")
                os.makedirs(vis_dir, exist_ok=True)
                for name, arr in model.last_visuals.items():
                    img = tensor2img(np.asarray(arr), rgb2bgr=True)
                    imwrite(img, osp.join(
                        vis_dir, "train.png" if name == "pred"
                        else f"train_{name}.png"))

            if current_iter % opt["logger"]["save_checkpoint_freq"] == 0:
                logger.info("Saving models and training states.")
                model.save(epoch, current_iter, best_metric=best_metric)

            if opt.get("val") is not None and current_iter % int(opt["val"]["val_freq"]) == 0:
                for val_loader in val_loaders:
                    psnr = model.validation(
                        val_loader, current_iter, tb_logger,
                        opt["val"].get("save_img", False),
                        opt["val"].get("rgb2bgr", True),
                        opt["val"].get("use_image", True),
                    )
                    if psnr and psnr > best_metric["psnr"]:
                        best_metric = {"psnr": float(psnr), "iter": current_iter}
                        model.save_best(best_metric)
                        logger.info(f"New best PSNR {psnr:.4f} @ iter {current_iter}")

            data_timer.start()
            iter_timer.start()
            train_data = prefetcher.next()
        epoch += 1

    consumed = datetime.timedelta(seconds=int(time.time() - start_time))
    logger.info(f"End of training. Time consumed: {consumed}")
    logger.info("Save the latest model.")
    model.save(epoch=-1, current_iter=current_iter)
    if opt.get("val") is not None:
        for val_loader in val_loaders:
            model.validation(val_loader, current_iter, tb_logger,
                             opt["val"].get("save_img", False))
    if tb_logger:
        tb_logger.close()
    return model


if __name__ == "__main__":
    root_path = osp.abspath(".")
    train_pipeline(root_path)
