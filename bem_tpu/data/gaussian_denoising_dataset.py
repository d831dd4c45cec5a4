"""Gaussian denoising dataset — GT only, LQ synthesized by noise.

Parity: basicsr/data/paired_image_dataset.py Dataset_GaussianDenoising:686-826
(sigma_type constant/random/choice at train, sigma_test at val; gray or
color in_ch) and FFHQDataset (ffhq_dataset.py, GT-only face crops).
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from ..utils.file_client import FileClient
from ..utils.img_util import imfrombytes, img2tensor, padding
from ..utils.registry import DATASET_REGISTRY
from .data_util import scandir
from .transforms import paired_random_crop, random_augmentation


@DATASET_REGISTRY.register()
class Dataset_GaussianDenoising:
    def __init__(self, opt):
        self.opt = opt
        if opt["phase"] == "train":
            self.sigma_type = opt["sigma_type"]
            self.sigma_range = opt["sigma_range"]
            assert self.sigma_type in ("constant", "random", "choice")
        else:
            self.sigma_test = opt["sigma_test"]
        self.in_ch = opt.get("in_ch", 3)
        self.file_client = None
        self.io_backend_opt = dict(opt["io_backend"])
        self.gt_folder = opt["dataroot_gt"]
        self.rng = np.random.default_rng(opt.get("seed"))
        if self.opt.get("meta_info_file"):
            with open(self.opt["meta_info_file"]) as f:
                self.paths = [
                    f"{self.gt_folder}/{line.split(' ')[0].strip()}" for line in f
                ]
        else:
            self.paths = sorted(scandir(self.gt_folder, full_path=True))

    def _sigma(self):
        if self.sigma_type == "constant":
            return self.sigma_range
        if self.sigma_type == "random":
            return float(self.rng.uniform(*self.sigma_range))
        return float(self.rng.choice(self.sigma_range))

    def __getitem__(self, index):
        if self.file_client is None:
            io_opt = dict(self.io_backend_opt)
            self.file_client = FileClient(io_opt.pop("type"), **io_opt)
        gt_path = self.paths[index % len(self.paths)]
        img_bytes = self.file_client.get(gt_path, "gt")
        if self.in_ch == 3:
            img_gt = imfrombytes(img_bytes, float32=True)
            img_gt = img_gt[..., ::-1]  # BGR -> RGB (reference converts)
        else:
            img_gt = imfrombytes(img_bytes, flag="grayscale", float32=True)[..., None]
        img_gt = np.ascontiguousarray(img_gt)

        if self.opt["phase"] == "train":
            gt_size = self.opt["gt_size"]
            img_gt, _ = padding(img_gt, img_gt, gt_size)
            img_gt, _ = paired_random_crop(img_gt, img_gt.copy(), gt_size, 1,
                                           gt_path, rng=self.rng)
            if self.opt.get("geometric_augs", True):
                (img_gt,) = random_augmentation(img_gt, rng=self.rng)
            img_lq = img_gt + self.rng.normal(
                0, self._sigma() / 255.0, img_gt.shape
            ).astype(np.float32)
        else:
            np_rng = np.random.default_rng(0)  # deterministic test noise
            img_lq = img_gt + np_rng.normal(
                0, self.sigma_test / 255.0, img_gt.shape
            ).astype(np.float32)

        return {
            "lq": img_lq.astype(np.float32),
            "gt": img_gt.astype(np.float32),
            "lq_path": gt_path,
            "gt_path": gt_path,
        }

    def __len__(self):
        return len(self.paths)


@DATASET_REGISTRY.register()
class FFHQDataset:
    """GT-only dataset (reference ffhq_dataset.py)."""

    def __init__(self, opt):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt["io_backend"])
        self.gt_folder = opt["dataroot_gt"]
        self.mean = opt.get("mean")
        self.std = opt.get("std")
        self.rng = np.random.default_rng(opt.get("seed"))
        self.paths = sorted(scandir(self.gt_folder, full_path=True))

    def __getitem__(self, index):
        if self.file_client is None:
            io_opt = dict(self.io_backend_opt)
            self.file_client = FileClient(io_opt.pop("type"), **io_opt)
        gt_path = self.paths[index]
        img_gt = imfrombytes(self.file_client.get(gt_path, "gt"), float32=True)
        if self.rng.random() < 0.5 and self.opt.get("use_hflip", True):
            img_gt = img_gt[:, ::-1]
        img_gt = img2tensor(img_gt)
        if self.mean is not None or self.std is not None:
            img_gt = (img_gt - np.asarray(self.mean or 0.0, np.float32)) / np.asarray(
                self.std or 1.0, np.float32
            )
        return {"gt": img_gt, "gt_path": gt_path}

    def __len__(self):
        return len(self.paths)
