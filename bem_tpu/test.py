"""Test driver (reference: basicsr/test.py:11-45).

python -m bem_tpu.test --opt Options/<cfg>.yml
"""

from __future__ import annotations

import logging
import time
from os import path as osp

from .data import build_dataloader, build_dataset
from .models import build_model
from .utils.logger import get_root_logger
from .utils.misc import make_exp_dirs
from .utils.options import parse_options


def test_pipeline(root_path, args_list=None):
    opt, args = parse_options(root_path, is_train=False, args_list=args_list)
    opt["root_path"] = root_path

    make_exp_dirs(opt)
    log_file = osp.join(opt["path"]["log"], f"test_{opt['name']}_{int(time.time())}.log")
    logger = get_root_logger(log_level=logging.INFO, log_file=log_file)

    test_loaders = []
    for _, dataset_opt in sorted(opt["datasets"].items()):
        test_set = build_dataset(dataset_opt)
        test_loaders.append(build_dataloader(test_set, dataset_opt))
        logger.info(f"Number of test images in {dataset_opt['name']}: {len(test_set)}")

    model = build_model(opt)
    example = next(iter(test_loaders[0]))
    model.init_state(example, seed=opt.get("manual_seed", 0))
    load_path = opt["path"].get("pretrain_network_g")
    if load_path:
        model.load_network(load_path, opt["path"].get("strict_load_g", True),
                           opt["path"].get("param_key", "params"))

    for test_loader in test_loaders:
        name = test_loader.dataset.opt["name"]
        logger.info(f"Testing {name}...")
        model.validation(
            test_loader, current_iter=opt["name"], tb_logger=None,
            save_img=opt["val"].get("save_img", True),
            rgb2bgr=opt["val"].get("rgb2bgr", True),
            use_image=opt["val"].get("use_image", True),
        )


if __name__ == "__main__":
    test_pipeline(osp.abspath("."))
