"""Paired LQ/GT datasets producing canonical channels-last numpy samples.

Parity: basicsr/data/paired_image_dataset.py — Dataset_PairedImage:118 and
Dataset_PairedImage_Mask:235 (the class every BEM Option uses). A sample dict
carries {lq, gt, lq_path, gt_path [, mask][, hist_lq/hist_gt | lq_down/
gt_down]} exactly like the reference (:391-408), but images are HWC RGB
float32 (channels-last) rather than CHW tensors.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from ..utils.file_client import FileClient
from ..utils.histogram import histogram_condition
from ..utils.img_util import imfrombytes, img2tensor, padding
from ..utils.labelnoise import add_label_noise
from ..utils.mask import MaskGenerator
from ..utils.registry import DATASET_REGISTRY
from .data_util import (
    paired_paths_from_folder,
    paired_paths_from_lmdb,
    paired_paths_from_meta_info_file,
)
from .transforms import paired_random_crop, random_augmentation, augment


class _PairedBase:
    def __init__(self, opt):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt["io_backend"])
        self.mean = opt.get("mean")
        self.std = opt.get("std")
        self.gt_folder = opt["dataroot_gt"]
        self.lq_folder = opt["dataroot_lq"]
        self.filename_tmpl = opt.get("filename_tmpl", "{}")
        self.rng = np.random.default_rng(opt.get("seed"))

        if self.io_backend_opt["type"] == "lmdb":
            self.io_backend_opt["db_paths"] = [self.lq_folder, self.gt_folder]
            self.io_backend_opt["client_keys"] = ["lq", "gt"]
            self.paths = paired_paths_from_lmdb(
                [self.lq_folder, self.gt_folder], ["lq", "gt"]
            )
        elif self.opt.get("meta_info_file") is not None:
            self.paths = paired_paths_from_meta_info_file(
                [self.lq_folder, self.gt_folder], ["lq", "gt"],
                self.opt["meta_info_file"], self.filename_tmpl,
            )
        else:
            self.paths = paired_paths_from_folder(
                [self.lq_folder, self.gt_folder], ["lq", "gt"], self.filename_tmpl
            )

    def _load_pair(self, index):
        if self.file_client is None:
            io_opt = dict(self.io_backend_opt)
            self.file_client = FileClient(io_opt.pop("type"), **io_opt)
        gt_path = self.paths[index]["gt_path"]
        lq_path = self.paths[index]["lq_path"]
        img_gt = imfrombytes(self.file_client.get(gt_path, "gt"), float32=True)
        img_lq = imfrombytes(self.file_client.get(lq_path, "lq"), float32=True)
        return img_gt, img_lq, gt_path, lq_path

    def _normalize(self, img):
        if self.mean is not None or self.std is not None:
            mean = np.asarray(self.mean or 0.0, np.float32)
            std = np.asarray(self.std or 1.0, np.float32)
            img = (img - mean) / std
        return img

    def __len__(self):
        return len(self.paths)


@DATASET_REGISTRY.register()
class Dataset_PairedImage(_PairedBase):
    """Plain paired dataset (paired_image_dataset.py:118-233)."""

    def __getitem__(self, index):
        index = index % len(self.paths)
        img_gt, img_lq, gt_path, lq_path = self._load_pair(index)
        if self.opt["phase"] == "train":
            gt_size = self.opt["gt_size"]
            img_gt, img_lq = padding(img_gt, img_lq, gt_size)
            img_gt, img_lq = paired_random_crop(
                img_gt, img_lq, gt_size, self.opt.get("scale", 1), gt_path, rng=self.rng
            )
            if self.opt.get("geometric_augs"):
                img_gt, img_lq = random_augmentation(img_gt, img_lq, rng=self.rng)
        img_gt = self._normalize(img2tensor(img_gt))
        img_lq = self._normalize(img2tensor(img_lq))
        return {"lq": img_lq, "gt": img_gt, "lq_path": lq_path, "gt_path": gt_path}


@DATASET_REGISTRY.register()
class Dataset_PairedImage_Mask(_PairedBase):
    """Paired dataset + condition (+MIM mask) (paired_image_dataset.py:235-412)."""

    def __init__(self, opt):
        super().__init__(opt)
        cond = opt["condition"]
        if cond["type"] not in ("histogram", "mean"):
            raise ValueError(f"condition type {cond['type']} not supported")
        self.use_mask = bool(opt.get("mim", False))
        if cond["type"] == "histogram" and self.use_mask:
            raise NotImplementedError("mim not supported for histogram condition")
        if self.use_mask:
            mim = opt["mim"]
            input_size = (
                opt["gt_size"]
                if opt.get("model_type", "ImageEnhancer") == "ImageEnhancer"
                else int(opt["gt_size"] / cond.get("scale_down", 1))
            )
            self.mask_generator = MaskGenerator(
                input_size=input_size,
                mask_patch_size=mim["mask_patch_size"],
                model_patch_size=mim["model_patch_size"],
                mask_ratio=mim["mask_ratio"],
                rng=self.rng,
            )
        self.model_type = opt.get("model_type", "ImageEnhancer")
        self.cond = cond

    def __getitem__(self, index):
        index = index % len(self.paths)
        img_gt, img_lq, gt_path, lq_path = self._load_pair(index)

        if self.opt["phase"] == "train":
            gt_size = self.opt["gt_size"]
            img_gt, img_lq = padding(img_gt, img_lq, gt_size)
            img_gt, img_lq = paired_random_crop(
                img_gt, img_lq, gt_size, self.opt.get("scale", 1), gt_path, rng=self.rng
            )
            if self.opt.get("geometric_augs"):
                img_gt, img_lq = random_augmentation(img_gt, img_lq, rng=self.rng)
            if self.opt.get("labelnoise"):
                ln = self.opt["labelnoise"]
                img_gt = add_label_noise(
                    img_gt,
                    tem_mean=ln.get("tem_mean", 1), tem_var=ln.get("tem_var", 0.03),
                    bright_mean=ln.get("bright_mean", 1.15),
                    bright_var=ln.get("bright_var", 0.15),
                    contrast_mean=ln.get("contrast_mean", 1.15),
                    contrast_var=ln.get("contrast_var", 0.15),
                    rng=self.rng,
                )

        out = {"lq_path": lq_path, "gt_path": gt_path}

        if self.cond["type"] == "histogram":
            # histograms computed on RGB (reference flips BGR->RGB first,
            # paired_image_dataset.py:356)
            out["hist_gt"] = histogram_condition(
                img_gt[:, :, ::-1], self.cond["hist_patch_size"], self.cond["num_bins"]
            )
            if self.model_type == "ConditionGenerator":
                out["hist_lq"] = histogram_condition(
                    img_lq[:, :, ::-1], self.cond["hist_patch_size"], self.cond["num_bins"]
                )
        else:
            sd = self.cond["scale_down"]
            down_gt = cv2.resize(img_gt, None, fx=1 / sd, fy=1 / sd,
                                 interpolation=cv2.INTER_LINEAR)
            out["gt_down"] = self._normalize(img2tensor(down_gt))
            if self.model_type == "ConditionGenerator":
                down_lq = cv2.resize(img_lq, None, fx=1 / sd, fy=1 / sd,
                                     interpolation=cv2.INTER_LINEAR)
                out["lq_down"] = self._normalize(img2tensor(down_lq))

        out["gt"] = self._normalize(img2tensor(img_gt))
        out["lq"] = self._normalize(img2tensor(img_lq))
        if self.use_mask:
            out["mask"] = self.mask_generator()
        return out


@DATASET_REGISTRY.register()
class Dataset_PairedImage_Slide(_PairedBase):
    """Sliding-window patch dataset: each 400x600 image contributes a fixed
    grid of (gt_size, stride) patches; index maps to (image, row, col)
    deterministically (paired_image_dataset.py:416-562)."""

    IMG_H, IMG_W = 400, 600  # hard-coded in the reference (:455)

    def __init__(self, opt):
        super().__init__(opt)
        stride = opt["stride"]
        crop_size = opt["gt_size"]
        self.patch_per_line = (self.IMG_W - crop_size) // stride + 1
        self.patch_per_colum = (self.IMG_H - crop_size) // stride + 1
        self.patch_per_img = self.patch_per_line * self.patch_per_colum

    def __getitem__(self, index):
        stride = self.opt["stride"]
        crop_size = self.opt["gt_size"]
        img_idx, patch_idx = divmod(index, self.patch_per_img)
        h_idx, w_idx = divmod(patch_idx, self.patch_per_line)
        img_idx = img_idx % len(self.paths)
        img_gt, img_lq, gt_path, lq_path = self._load_pair(img_idx)
        sl_h = slice(h_idx * stride, h_idx * stride + crop_size)
        sl_w = slice(w_idx * stride, w_idx * stride + crop_size)
        img_lq = img_lq[sl_h, sl_w, :]
        img_gt = img_gt[sl_h, sl_w, :]
        if self.opt["phase"] == "train":
            # rotTimes/vFlip/hFlip applied identically to both (:494-547)
            rot_times = int(self.rng.integers(0, 4))
            vflip = int(self.rng.integers(0, 2))
            hflip = int(self.rng.integers(0, 2))

            def _aug(img):
                for _ in range(rot_times):
                    img = np.rot90(img, axes=(0, 1)).copy()
                if vflip:
                    img = img[:, ::-1, :].copy()
                if hflip:
                    img = img[::-1, :, :].copy()
                return img
            img_lq, img_gt = _aug(img_lq), _aug(img_gt)
        return {
            "lq": img2tensor(img_lq), "gt": img2tensor(img_gt),
            "lq_path": lq_path, "gt_path": gt_path,
        }

    def __len__(self):
        return len(self.paths) * self.patch_per_img


@DATASET_REGISTRY.register()
class Dataset_PairedImage_Norm(Dataset_PairedImage):
    """Paired dataset whose LQ is min-max normalized to [0,1] after load
    (paired_image_dataset.py:563-684, `img_lq = (lq-min)/(max-min)` :670)."""

    def __getitem__(self, index):
        out = super().__getitem__(index)
        lq = out["lq"]
        rng_span = lq.max() - lq.min()
        out["lq"] = (lq - lq.min()) / (rng_span if rng_span > 0 else 1.0)
        return out


@DATASET_REGISTRY.register()
class Dataset_DefocusDeblur_DualPixel_16bit:
    """Dual-pixel defocus-deblur triples (lqL, lqR, gt) stored as 16-bit
    images; emits lq = concat(lqL, lqR) over channels
    (paired_image_dataset.py:828-915)."""

    def __init__(self, opt):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt["io_backend"])
        self.mean = opt.get("mean")
        self.std = opt.get("std")
        self.filename_tmpl = opt.get("filename_tmpl", "{}")
        self.rng = np.random.default_rng(opt.get("seed"))
        from .data_util import paired_DP_paths_from_folder

        self.paths = paired_DP_paths_from_folder(
            [opt["dataroot_lqL"], opt["dataroot_lqR"], opt["dataroot_gt"]],
            ["lqL", "lqR", "gt"], self.filename_tmpl,
        )

    def __getitem__(self, index):
        from ..utils.img_util import imfrombytesDP, padding_DP

        if self.file_client is None:
            io_opt = dict(self.io_backend_opt)
            self.file_client = FileClient(io_opt.pop("type"), **io_opt)
        index = index % len(self.paths)
        gt_path = self.paths[index]["gt_path"]
        lqL_path = self.paths[index]["lqL_path"]
        lqR_path = self.paths[index]["lqR_path"]
        img_gt = imfrombytesDP(self.file_client.get(gt_path, "gt"), float32=True)
        img_lqL = imfrombytesDP(self.file_client.get(lqL_path, "lqL"), float32=True)
        img_lqR = imfrombytesDP(self.file_client.get(lqR_path, "lqR"), float32=True)

        if self.opt["phase"] == "train":
            gt_size = self.opt["gt_size"]
            img_lqL, img_lqR, img_gt = padding_DP(img_lqL, img_lqR, img_gt, gt_size)
            img_gt, (img_lqL, img_lqR) = paired_random_crop(
                img_gt, [img_lqL, img_lqR], gt_size,
                self.opt.get("scale", 1), gt_path, rng=self.rng,
            )
            if self.opt.get("geometric_augs"):
                img_gt, img_lqL, img_lqR = random_augmentation(
                    img_gt, img_lqL, img_lqR, rng=self.rng
                )

        img_gt = img2tensor(img_gt)
        img_lqL = img2tensor(img_lqL)
        img_lqR = img2tensor(img_lqR)
        if self.mean is not None or self.std is not None:
            mean = np.asarray(self.mean or 0.0, np.float32)
            std = np.asarray(self.std or 1.0, np.float32)
            img_gt = (img_gt - mean) / std
            img_lqL = (img_lqL - mean) / std
            img_lqR = (img_lqR - mean) / std
        img_lq = np.concatenate([img_lqL, img_lqR], axis=-1)
        return {"lq": img_lq, "gt": img_gt, "lq_path": lqL_path, "gt_path": gt_path}

    def __len__(self):
        return len(self.paths)


@DATASET_REGISTRY.register(name="PairedImageDataset")
class PairedImageDataset(Dataset_PairedImage):
    """BasicSR-era alias using augment() instead of random_augmentation
    (paired_image_dataset.py:19-115)."""

    def __getitem__(self, index):
        index = index % len(self.paths)
        img_gt, img_lq, gt_path, lq_path = self._load_pair(index)
        if self.opt["phase"] == "train":
            gt_size = self.opt["gt_size"]
            img_gt, img_lq = padding(img_gt, img_lq, gt_size)
            img_gt, img_lq = paired_random_crop(
                img_gt, img_lq, gt_size, self.opt.get("scale", 1), gt_path, rng=self.rng
            )
            img_gt, img_lq = augment(
                [img_gt, img_lq],
                self.opt.get("use_hflip", True),
                self.opt.get("use_rot", True),
                rng=self.rng,
            )
        img_gt = self._normalize(img2tensor(img_gt))
        img_lq = self._normalize(img2tensor(img_lq))
        return {"lq": img_lq, "gt": img_gt, "lq_path": lq_path, "gt_path": gt_path}
