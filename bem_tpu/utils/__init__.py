from .registry import (
    ARCH_REGISTRY,
    DATASET_REGISTRY,
    LOSS_REGISTRY,
    METRIC_REGISTRY,
    MODEL_REGISTRY,
)
from .logger import AvgTimer, MessageLogger, get_root_logger, init_tb_logger
from .img_util import img2tensor, tensor2img, imfrombytes, imwrite, imread, padding
from .misc import make_exp_dirs, mkdir_and_rename, get_time_str, check_resume, sizeof_fmt
from .options import parse, parse_options, set_random_seed

__all__ = [
    "ARCH_REGISTRY", "DATASET_REGISTRY", "LOSS_REGISTRY", "METRIC_REGISTRY",
    "MODEL_REGISTRY", "AvgTimer", "MessageLogger", "get_root_logger",
    "init_tb_logger", "img2tensor", "tensor2img", "imfrombytes", "imwrite",
    "imread", "padding", "make_exp_dirs", "mkdir_and_rename", "get_time_str",
    "check_resume", "sizeof_fmt", "parse", "parse_options", "set_random_seed",
]
