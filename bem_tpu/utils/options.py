"""YAML Options parsing (reference: basicsr/utils/options.py).

Keeps the reference's Options/*.yml schema working verbatim: yaml anchors for
the shared ``condition`` block, ``!!float`` literals, ``~`` for None,
phase/scale/model_type injection into each dataset block (options.py:156-198),
``--force_yml`` overrides (options.py:132-143) and ``--debug`` freq shrinking
(options.py:184-189).
"""

from __future__ import annotations

import argparse
import os
import random
import sys
from os import path as osp
from typing import Any, Dict, Optional

import yaml


def yaml_load(f: str) -> Dict[str, Any]:
    if f.endswith((".yml", ".yaml")) and os.path.exists(f):
        with open(f, "r") as fh:
            return yaml.load(fh, Loader=yaml.SafeLoader)
    return yaml.load(f, Loader=yaml.SafeLoader)


def set_random_seed(seed: int):
    import numpy as np

    random.seed(seed)
    np.random.seed(seed)


def _set_nested(opt: Dict, keys, value):
    d = opt
    for k in keys[:-1]:
        d = d.setdefault(k, {})
    d[keys[-1]] = value


def parse_options(root_path: str, is_train: bool = True, args_list=None):
    """CLI entry parse (options.py:99-201). Returns (opt, args)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", "--opt", type=str, required=True, help="Path to option YAML file.")
    parser.add_argument("--launcher", choices=["none", "pytorch", "slurm", "jax"],
                        default="none", help="distributed launcher")
    parser.add_argument("--auto_resume", action="store_true")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--local_rank", type=int, default=0)
    parser.add_argument(
        "--force_yml", nargs="+", default=None,
        help="Force to update yml files. Examples: train:ema_decay=0.999",
    )
    args = parser.parse_args(args_list)

    opt = yaml_load(args.opt)

    # distributed settings: multi-host JAX init (dist_util.py:10-57 equivalent)
    if args.launcher == "none":
        opt["dist"] = False
    else:
        opt["dist"] = True
        if args.launcher == "jax":
            import jax

            jax.distributed.initialize()
    import jax

    opt["rank"] = jax.process_index()
    opt["world_size"] = jax.process_count()

    # random seed
    seed = opt.get("manual_seed")
    if seed is None:
        seed = random.randint(1, 10000)
        opt["manual_seed"] = seed
    set_random_seed(seed + opt["rank"])

    # force yml overrides
    if args.force_yml is not None:
        for entry in args.force_yml:
            entry = entry.replace(" ", "")
            keys, value = entry.split("=")
            _set_nested(opt, keys.split(":"), yaml.safe_load(value))

    opt["auto_resume"] = args.auto_resume
    opt["is_train"] = is_train

    if args.debug and not opt["name"].startswith("debug"):
        opt["name"] = "debug_" + opt["name"]

    if opt.get("num_gpu") == "auto":
        opt["num_gpu"] = len(jax.devices())

    _expand(opt, root_path, is_train)

    if args.debug:
        if "val" in opt:
            opt["val"]["val_freq"] = 8
        opt["logger"]["print_freq"] = 1
        opt["logger"]["save_checkpoint_freq"] = 8

    return opt, args


def parse(opt_path: str, root_path: str = ".", is_train: bool = True) -> Dict[str, Any]:
    """Library-style parse (options.py:220-260) — no CLI."""
    opt = yaml_load(opt_path)
    opt.setdefault("dist", False)
    opt.setdefault("rank", 0)
    opt.setdefault("world_size", 1)
    opt["is_train"] = is_train
    if opt.get("manual_seed") is not None:
        set_random_seed(opt["manual_seed"])
    _expand(opt, root_path, is_train)
    return opt


def _expand(opt: Dict[str, Any], root_path: str, is_train: bool):
    """datasets/paths injection (options.py:156-198)."""
    opt["scale"] = opt.get("scale", 1)
    for phase, dataset in (opt.get("datasets") or {}).items():
        phase_name = phase.split("_")[0]
        dataset["phase"] = phase_name
        dataset["scale"] = opt["scale"]
        dataset["model_type"] = opt.get("model_type", "ImageEnhancer")
        if "condition" in opt and "condition" not in dataset:
            dataset["condition"] = opt["condition"]
        if dataset.get("dataroot_gt") is not None:
            dataset["dataroot_gt"] = osp.expanduser(dataset["dataroot_gt"])
        if dataset.get("dataroot_lq") is not None:
            dataset["dataroot_lq"] = osp.expanduser(dataset["dataroot_lq"])

    opt.setdefault("path", {})
    for key, val in opt["path"].items():
        if val is not None and ("resume_state" in key or "pretrain_network" in key):
            opt["path"][key] = osp.expanduser(val)
    if is_train:
        experiments_root = osp.join(root_path, "experiments", opt["name"])
        opt["path"]["experiments_root"] = experiments_root
        opt["path"]["models"] = osp.join(experiments_root, "models")
        opt["path"]["training_states"] = osp.join(experiments_root, "training_states")
        opt["path"]["log"] = experiments_root
        opt["path"]["visualization"] = osp.join(experiments_root, "visualization")
    else:
        results_root = osp.join(root_path, "results", opt["name"])
        opt["path"]["results_root"] = results_root
        opt["path"]["log"] = results_root
        opt["path"]["visualization"] = osp.join(results_root, "visualization")


def copy_opt_file(opt_file: str, experiments_root: str):
    """Archive the options file with timestamp + argv header (options.py:203-217)."""
    import time
    from shutil import copyfile

    os.makedirs(experiments_root, exist_ok=True)
    filename = osp.join(experiments_root, osp.basename(opt_file))
    copyfile(opt_file, filename)
    with open(filename, "r+") as f:
        lines = f.readlines()
        lines.insert(0, f"# GENERATE TIME: {time.asctime()}\n# CMD:\n# {' '.join(sys.argv)}\n\n")
        f.seek(0)
        f.writelines(lines)
