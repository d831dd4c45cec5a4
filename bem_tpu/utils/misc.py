"""Misc utilities (reference: basicsr/utils/misc.py)."""

from __future__ import annotations

import os
import time
from os import path as osp


def get_time_str():
    return time.strftime("%Y%m%d_%H%M%S", time.localtime())


def mkdir_and_rename(path: str):
    """Archive an existing dir with a timestamp suffix then mkdir (misc.py:24-35)."""
    if osp.exists(path):
        new_name = path + "_archived_" + get_time_str()
        print(f"Path already exists. Rename it to {new_name}", flush=True)
        os.rename(path, new_name)
    os.makedirs(path, exist_ok=True)


def make_exp_dirs(opt):
    """Create experiment dirs (misc.py:38-50)."""
    path_opt = dict(opt["path"])
    if opt.get("is_train"):
        mkdir_and_rename(path_opt.pop("experiments_root"))
    else:
        mkdir_and_rename(path_opt.pop("results_root"))
    for key, p in path_opt.items():
        if ("strict_load" in key or "pretrain_network" in key
                or "resume" in key or "param_key" in key):
            continue
        if isinstance(p, str):
            os.makedirs(p, exist_ok=True)


def check_resume(opt, resume_iter: int):
    """Rewire pretrain paths to the resumed nets (misc.py:94-141)."""
    if opt["path"].get("resume_state"):
        for key in list(opt["path"].keys()):
            if key.startswith("pretrain_network"):
                name = key.replace("pretrain_network_", "")
                opt["path"][key] = osp.join(
                    opt["path"]["models"], f"net_{name}_{resume_iter}.msgpack"
                )


def sizeof_fmt(size: float, suffix="B"):
    for unit in ["", "K", "M", "G", "T", "P", "E", "Z"]:
        if abs(size) < 1024.0:
            return f"{size:3.1f} {unit}{suffix}"
        size /= 1024.0
    return f"{size:3.1f} Y{suffix}"
