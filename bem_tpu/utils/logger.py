"""Logging / observability (reference: basicsr/utils/logger.py).

- get_root_logger (logger.py:146-185): process-0-aware python logger with
  optional file handler.
- MessageLogger (logger.py:45-115): console+tensorboard train-progress lines
  with ETA.
- AvgTimer (logger.py:10-42): windowed iteration/data timers.
- init_tb_logger / init_wandb_logger: tensorboardX writer; wandb gated on
  availability (zero-egress environments run without it).
"""

from __future__ import annotations

import datetime
import logging
import time
from typing import Optional

initialized_logger = {}


def get_root_logger(logger_name="bem_tpu", log_level=logging.INFO, log_file=None):
    logger = logging.getLogger(logger_name)
    if logger_name in initialized_logger:
        return logger
    fmt = "%(asctime)s %(levelname)s: %(message)s"
    sh = logging.StreamHandler()
    sh.setFormatter(logging.Formatter(fmt, datefmt="%Y-%m-%d %H:%M:%S"))
    logger.addHandler(sh)
    logger.propagate = False
    try:
        import jax

        is_main = jax.process_index() == 0
    except Exception:
        is_main = True
    if not is_main:
        logger.setLevel("ERROR")
    else:
        logger.setLevel(log_level)
        if log_file is not None:
            fh = logging.FileHandler(log_file, "w")
            fh.setFormatter(logging.Formatter(fmt, datefmt="%Y-%m-%d %H:%M:%S"))
            logger.addHandler(fh)
    initialized_logger[logger_name] = True
    return logger


class AvgTimer:
    def __init__(self, window: int = 200):
        self.window = window
        self.current_time = 0.0
        self.total_time = 0.0
        self.count = 0
        self.avg_time = 0.0
        self.start()

    def start(self):
        self.start_time = self.tic = time.time()

    def record(self):
        self.count += 1
        self.toc = time.time()
        self.current_time = self.toc - self.tic
        self.total_time += self.current_time
        self.avg_time = self.total_time / self.count
        if self.count > self.window:
            self.count = 0
            self.total_time = 0
        self.tic = time.time()

    def get_current_time(self):
        return self.current_time

    def get_avg_time(self):
        return self.avg_time


class MessageLogger:
    """Format train progress (epoch/iter/lr/ETA/losses) like logger.py:45-115."""

    def __init__(self, opt, start_iter: int = 1, tb_logger=None):
        self.exp_name = opt["name"]
        self.interval = opt["logger"]["print_freq"]
        self.start_iter = start_iter
        self.max_iters = opt["train"]["total_iter"]
        self.use_tb_logger = opt["logger"].get("use_tb_logger", False)
        self.tb_logger = tb_logger
        self.start_time = time.time()
        self.logger = get_root_logger()

    def reset_start_time(self):
        self.start_time = time.time()

    def __call__(self, log_vars: dict):
        epoch = log_vars.pop("epoch")
        current_iter = log_vars.pop("iter")
        lrs = log_vars.pop("lrs")
        message = (
            f"[{self.exp_name[:5]}..][epoch:{epoch:3d}, iter:{current_iter:8,d}, lr:("
        )
        message += ", ".join(f"{lr:.3e}" for lr in lrs) + ")] "

        if "time" in log_vars:
            iter_time = log_vars.pop("time")
            data_time = log_vars.pop("data_time")
            total_time = time.time() - self.start_time
            time_sec_avg = total_time / max(current_iter - self.start_iter + 1, 1)
            eta_sec = time_sec_avg * (self.max_iters - current_iter - 1)
            eta_str = str(datetime.timedelta(seconds=int(eta_sec)))
            message += f"[eta: {eta_str}, time (data): {iter_time:.3f} ({data_time:.3f})] "

        for k, v in log_vars.items():
            message += f"{k}: {v:.4e} "
            if self.tb_logger and self.use_tb_logger:
                key = f"losses/{k}" if k.startswith("l_") else k
                self.tb_logger.add_scalar(key, v, current_iter)
        self.logger.info(message)


def init_tb_logger(log_dir: str):
    try:
        from tensorboardX import SummaryWriter
    except ImportError:  # pragma: no cover
        return None
    return SummaryWriter(log_dir=log_dir)


def init_wandb_logger(opt):  # pragma: no cover - needs network egress
    try:
        import wandb
    except ImportError:
        get_root_logger().warning("wandb unavailable; skipping wandb logger.")
        return
    project = opt["logger"]["wandb"]["project"]
    resume_id = opt["logger"]["wandb"].get("resume_id")
    kwargs = dict(id=resume_id, resume="allow") if resume_id else {}
    wandb.init(project=project, name=opt["name"], sync_tensorboard=True, **kwargs)
