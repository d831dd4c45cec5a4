"""SID (See-in-the-Dark) image-sequence dataset
(reference: basicsr/data/SID_image_dataset.py Dataset_SIDImage:91-201).

Per-clip folders of short-exposure LQ frames paired with a long-exposure GT;
validation-style iteration with optional train-time crops + flips.
"""

from __future__ import annotations

import glob
import os
import random
from os import path as osp

import numpy as np

from ..utils.img_util import imread
from ..utils.registry import DATASET_REGISTRY


def _read_img_seq(paths, size=None):
    imgs = []
    for p in paths:
        img = imread(p)
        if size is not None:
            import cv2

            img = cv2.resize(img, (size[1], size[0]), interpolation=cv2.INTER_AREA)
        imgs.append(img)
    return np.stack(imgs, axis=0)  # (T, H, W, 3) RGB


@DATASET_REGISTRY.register()
class Dataset_SIDImage:
    def __init__(self, opt):
        self.opt = opt
        self.cache_data = opt.get("cache_data", False)
        self.half_N_frames = opt.get("N_frames", 1) // 2
        self.gt_root = opt["dataroot_gt"]
        self.lq_root = opt["dataroot_lq"]
        self.data_info = {"path_LQ": [], "path_GT": [], "folder": [], "idx": [],
                          "border": []}
        self.imgs_lq, self.imgs_gt = {}, {}
        subfolders_lq = sorted(glob.glob(osp.join(self.lq_root, "*")))
        subfolders_gt = sorted(glob.glob(osp.join(self.gt_root, "*")))
        for sub_lq, sub_gt in zip(subfolders_lq, subfolders_gt):
            folder = osp.basename(sub_lq)
            lq_paths = sorted(glob.glob(osp.join(sub_lq, "*")))
            gt_paths = sorted(glob.glob(osp.join(sub_gt, "*")))
            n = len(lq_paths)
            # GT may be a single long-exposure frame repeated per clip
            if len(gt_paths) == 1:
                gt_paths = gt_paths * n
            self.data_info["path_LQ"].extend(lq_paths)
            self.data_info["path_GT"].extend(gt_paths)
            self.data_info["folder"].extend([folder] * n)
            for i in range(n):
                self.data_info["idx"].append(f"{i}/{n}")
            border = [0] * n
            for i in range(self.half_N_frames):
                border[i] = 1
                border[n - i - 1] = 1
            self.data_info["border"].extend(border)
            if self.cache_data:
                self.imgs_lq[folder] = _read_img_seq(lq_paths)
                self.imgs_gt[folder] = _read_img_seq(gt_paths)

    def __getitem__(self, index):
        lq = imread(self.data_info["path_LQ"][index])
        gt = imread(self.data_info["path_GT"][index])
        if self.opt.get("phase") == "train" and self.opt.get("gt_size"):
            p = self.opt["gt_size"]
            h, w = lq.shape[:2]
            top = random.randint(0, max(h - p, 0))
            left = random.randint(0, max(w - p, 0))
            lq = lq[top : top + p, left : left + p]
            gt = gt[top : top + p, left : left + p]
            if self.opt.get("use_hflip", True) and random.random() < 0.5:
                lq, gt = lq[:, ::-1], gt[:, ::-1]
            if self.opt.get("use_rot", True) and random.random() < 0.5:
                lq, gt = lq[::-1], gt[::-1]
        return {
            "lq": np.ascontiguousarray(lq),
            "gt": np.ascontiguousarray(gt),
            "folder": self.data_info["folder"][index],
            "idx": self.data_info["idx"][index],
            "border": self.data_info["border"][index],
            "lq_path": self.data_info["path_LQ"][index],
            "gt_path": self.data_info["path_GT"][index],
        }

    def __len__(self):
        return len(self.data_info["path_LQ"])
