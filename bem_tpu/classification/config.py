"""Classification-harness config tree.

Reference: basicsr/vmamba/config.py (299 LoC, yacs CfgNode). yacs is not
in this environment, so CfgNode here is a small self-contained dict
subclass with the pieces the harness uses: attribute access, freeze(),
BASE-file recursive merge, merge_from_file, merge_from_list, clone, dump.
The default tree reproduces the reference's fields and defaults 1:1
(vmamba/config.py:53-199) so the shipped vssm yaml configs parse verbatim.
"""

from __future__ import annotations

import copy
import os
from typing import Any, List

import yaml


class CfgNode(dict):
    """yacs.config.CfgNode lookalike (attribute-style nested config)."""

    IMMUTABLE = "__immutable__"

    def __init__(self, init_dict=None):
        super().__init__()
        self.__dict__[CfgNode.IMMUTABLE] = False
        for k, v in (init_dict or {}).items():
            self[k] = CfgNode(v) if isinstance(v, dict) else v

    # -- attribute protocol --------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        if name in self:
            return self[name]
        raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        if self.__dict__.get(CfgNode.IMMUTABLE, False):
            raise AttributeError(
                f"Attempted to set {name} on an immutable CfgNode (call "
                "defrost() first)")
        self[name] = value

    # -- mutability ----------------------------------------------------------
    def freeze(self):
        self.__dict__[CfgNode.IMMUTABLE] = True
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()

    def defrost(self):
        self.__dict__[CfgNode.IMMUTABLE] = False
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()

    def is_frozen(self) -> bool:
        return self.__dict__[CfgNode.IMMUTABLE]

    def clone(self) -> "CfgNode":
        c = CfgNode()
        for k, v in self.items():
            c[k] = v.clone() if isinstance(v, CfgNode) else copy.deepcopy(v)
        return c

    # -- merging -------------------------------------------------------------
    def _merge_dict(self, other: dict):
        for k, v in other.items():
            if isinstance(v, dict) and isinstance(self.get(k), CfgNode):
                self[k]._merge_dict(v)
            elif isinstance(v, dict):
                self[k] = CfgNode(v)
            else:
                self[k] = v

    def merge_from_file(self, cfg_file: str):
        with open(cfg_file) as f:
            self._merge_dict(yaml.safe_load(f) or {})

    def merge_from_list(self, opts: List[str]):
        """['TRAIN.BASE_LR', '1e-3', ...] pairs (vmamba/main.py --opts)."""
        assert len(opts) % 2 == 0, opts
        for key, val in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            old = node.get(parts[-1])
            node[parts[-1]] = _coerce(val, old)

    def dump(self) -> str:
        def plain(n):
            return {k: plain(v) if isinstance(v, CfgNode) else v
                    for k, v in n.items()}

        return yaml.safe_dump(plain(self), sort_keys=False)


def _coerce(val: str, like: Any) -> Any:
    if isinstance(like, bool):
        return val.lower() in ("1", "true", "yes")
    if isinstance(like, int) and not isinstance(like, bool):
        try:
            return int(val)
        except ValueError:
            return float(val)
    if isinstance(like, float):
        return float(val)
    if isinstance(like, (list, tuple)):
        return yaml.safe_load(val)
    try:
        return yaml.safe_load(val)
    except Exception:
        return val


# ---------------------------------------------------------------------------
# Default tree — field-for-field with basicsr/vmamba/config.py:53-199
# ---------------------------------------------------------------------------

_C = CfgNode()
_C.BASE = [""]

_C.DATA = CfgNode()
_C.DATA.BATCH_SIZE = 128
_C.DATA.DATA_PATH = ""
_C.DATA.DATASET = "imagenet"
_C.DATA.IMG_SIZE = 224
_C.DATA.INTERPOLATION = "bicubic"
_C.DATA.ZIP_MODE = False
_C.DATA.CACHE_MODE = "part"
_C.DATA.PIN_MEMORY = True
_C.DATA.NUM_WORKERS = 8
_C.DATA.MASK_PATCH_SIZE = 32
_C.DATA.MASK_RATIO = 0.6

_C.MODEL = CfgNode()
_C.MODEL.TYPE = "vssm"
_C.MODEL.NAME = "vssm_tiny_224"
_C.MODEL.PRETRAINED = ""
_C.MODEL.RESUME = ""
_C.MODEL.NUM_CLASSES = 1000
_C.MODEL.DROP_RATE = 0.0
_C.MODEL.DROP_PATH_RATE = 0.1
_C.MODEL.LABEL_SMOOTHING = 0.1
_C.MODEL.MMCKPT = False

_C.MODEL.VSSM = CfgNode()
_C.MODEL.VSSM.PATCH_SIZE = 4
_C.MODEL.VSSM.IN_CHANS = 3
_C.MODEL.VSSM.DEPTHS = [2, 2, 9, 2]
_C.MODEL.VSSM.EMBED_DIM = 96
_C.MODEL.VSSM.SSM_D_STATE = 16
_C.MODEL.VSSM.SSM_RATIO = 2.0
_C.MODEL.VSSM.SSM_RANK_RATIO = 2.0
_C.MODEL.VSSM.SSM_DT_RANK = "auto"
_C.MODEL.VSSM.SSM_ACT_LAYER = "silu"
_C.MODEL.VSSM.SSM_CONV = 3
_C.MODEL.VSSM.SSM_CONV_BIAS = True
_C.MODEL.VSSM.SSM_DROP_RATE = 0.0
_C.MODEL.VSSM.SSM_INIT = "v0"
_C.MODEL.VSSM.SSM_FORWARDTYPE = "v2"
_C.MODEL.VSSM.MLP_RATIO = 4.0
_C.MODEL.VSSM.MLP_ACT_LAYER = "gelu"
_C.MODEL.VSSM.MLP_DROP_RATE = 0.0
_C.MODEL.VSSM.PATCH_NORM = True
_C.MODEL.VSSM.NORM_LAYER = "ln"
_C.MODEL.VSSM.DOWNSAMPLE = "v2"
_C.MODEL.VSSM.PATCHEMBED = "v2"
_C.MODEL.VSSM.POSEMBED = False
_C.MODEL.VSSM.GMLP = False

_C.TRAIN = CfgNode()
_C.TRAIN.START_EPOCH = 0
_C.TRAIN.EPOCHS = 300
_C.TRAIN.WARMUP_EPOCHS = 20
_C.TRAIN.WEIGHT_DECAY = 0.05
_C.TRAIN.BASE_LR = 5e-4
_C.TRAIN.WARMUP_LR = 5e-7
_C.TRAIN.MIN_LR = 5e-6
_C.TRAIN.CLIP_GRAD = 5.0
_C.TRAIN.AUTO_RESUME = True
_C.TRAIN.ACCUMULATION_STEPS = 1
_C.TRAIN.USE_CHECKPOINT = False

_C.TRAIN.LR_SCHEDULER = CfgNode()
_C.TRAIN.LR_SCHEDULER.NAME = "cosine"
_C.TRAIN.LR_SCHEDULER.DECAY_EPOCHS = 30
_C.TRAIN.LR_SCHEDULER.DECAY_RATE = 0.1
_C.TRAIN.LR_SCHEDULER.WARMUP_PREFIX = True
_C.TRAIN.LR_SCHEDULER.GAMMA = 0.1
_C.TRAIN.LR_SCHEDULER.MULTISTEPS = []

_C.TRAIN.OPTIMIZER = CfgNode()
_C.TRAIN.OPTIMIZER.NAME = "adamw"
_C.TRAIN.OPTIMIZER.EPS = 1e-8
_C.TRAIN.OPTIMIZER.BETAS = (0.9, 0.999)
_C.TRAIN.OPTIMIZER.MOMENTUM = 0.9
_C.TRAIN.LAYER_DECAY = 1.0

_C.TRAIN.MOE = CfgNode()
_C.TRAIN.MOE.SAVE_MASTER = False

_C.AUG = CfgNode()
_C.AUG.COLOR_JITTER = 0.4
_C.AUG.AUTO_AUGMENT = "rand-m9-mstd0.5-inc1"
_C.AUG.REPROB = 0.25
_C.AUG.REMODE = "pixel"
_C.AUG.RECOUNT = 1
_C.AUG.MIXUP = 0.8
_C.AUG.CUTMIX = 1.0
_C.AUG.CUTMIX_MINMAX = None
_C.AUG.MIXUP_PROB = 1.0
_C.AUG.MIXUP_SWITCH_PROB = 0.5
_C.AUG.MIXUP_MODE = "batch"

_C.TEST = CfgNode()
_C.TEST.CROP = True
_C.TEST.SEQUENTIAL = False
_C.TEST.SHUFFLE = False

_C.ENABLE_AMP = False
_C.AMP_ENABLE = True
_C.AMP_OPT_LEVEL = ""
_C.OUTPUT = ""
_C.TAG = "default"
_C.SAVE_FREQ = 1
_C.PRINT_FREQ = 10
_C.SEED = 0
_C.EVAL_MODE = False
_C.THROUGHPUT_MODE = False
_C.TRAINCOST_MODE = False
_C.FUSED_LAYERNORM = False


def _update_config_from_file(config: CfgNode, cfg_file: str):
    """Recursive BASE-file merge (vmamba/config.py:203-214)."""
    with open(cfg_file) as f:
        yaml_cfg = yaml.safe_load(f) or {}
    for base in yaml_cfg.get("BASE", [""]):
        if base:
            _update_config_from_file(
                config, os.path.join(os.path.dirname(cfg_file), base))
    config.merge_from_file(cfg_file)


def update_config(config: CfgNode, args) -> CfgNode:
    """CLI-override plumbing (vmamba/config.py:216-270)."""
    if getattr(args, "cfg", None):
        _update_config_from_file(config, args.cfg)
    if getattr(args, "opts", None):
        config.merge_from_list(args.opts)
    simple = {
        "batch_size": ("DATA", "BATCH_SIZE"),
        "data_path": ("DATA", "DATA_PATH"),
        "cache_mode": ("DATA", "CACHE_MODE"),
        "pretrained": ("MODEL", "PRETRAINED"),
        "resume": ("MODEL", "RESUME"),
        "accumulation_steps": ("TRAIN", "ACCUMULATION_STEPS"),
        "output": ("OUTPUT",),
        "tag": ("TAG",),
    }
    for attr, path in simple.items():
        val = getattr(args, attr, None)
        if val:
            node = config
            for p in path[:-1]:
                node = node[p]
            node[path[-1]] = val
    if getattr(args, "zip", False):
        config.DATA.ZIP_MODE = True
    if getattr(args, "use_checkpoint", False):
        config.TRAIN.USE_CHECKPOINT = True
    if getattr(args, "disable_amp", False):
        config.AMP_ENABLE = False
    if getattr(args, "eval", False):
        config.EVAL_MODE = True
    if getattr(args, "throughput", False):
        config.THROUGHPUT_MODE = True
    config.OUTPUT = os.path.join(
        config.OUTPUT or "output", config.MODEL.NAME, config.TAG)
    return config


def get_config(args=None) -> CfgNode:
    config = _C.clone()
    if args is not None:
        update_config(config, args)
    return config
