"""Single-image (LQ-only) dataset (reference: basicsr/data/single_image_dataset.py)."""

from __future__ import annotations

import numpy as np

from ..utils.file_client import FileClient
from ..utils.img_util import imfrombytes, img2tensor
from ..utils.registry import DATASET_REGISTRY
from .data_util import scandir


@DATASET_REGISTRY.register()
class SingleImageDataset:
    """Reads LQ images only (inference datasets without GT)."""

    def __init__(self, opt):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt["io_backend"])
        self.mean = opt.get("mean")
        self.std = opt.get("std")
        self.lq_folder = opt["dataroot_lq"]
        if self.io_backend_opt["type"] == "lmdb":
            self.io_backend_opt["db_paths"] = [self.lq_folder]
            self.io_backend_opt["client_keys"] = ["lq"]
            with open(f"{self.lq_folder}/meta_info.txt") as f:
                self.paths = [line.split(".png")[0] for line in f]
        elif self.opt.get("meta_info_file") is not None:
            with open(self.opt["meta_info_file"]) as f:
                self.paths = [
                    f"{self.lq_folder}/{line.rstrip().split(' ')[0]}" for line in f
                ]
        else:
            self.paths = sorted(scandir(self.lq_folder, full_path=True))

    def __getitem__(self, index):
        if self.file_client is None:
            io_opt = dict(self.io_backend_opt)
            self.file_client = FileClient(io_opt.pop("type"), **io_opt)
        lq_path = self.paths[index]
        img_lq = imfrombytes(self.file_client.get(lq_path, "lq"), float32=True)
        img_lq = img2tensor(img_lq)
        if self.mean is not None or self.std is not None:
            img_lq = (img_lq - np.asarray(self.mean or 0.0, np.float32)) / np.asarray(
                self.std or 1.0, np.float32
            )
        return {"lq": img_lq, "lq_path": lq_path}

    def __len__(self):
        return len(self.paths)
