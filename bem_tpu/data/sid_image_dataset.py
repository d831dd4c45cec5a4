"""SID (See-in-the-Dark) image dataset
(reference: basicsr/data/SID_image_dataset.py Dataset_SIDImage:91-201).

Per-clip folders of short-exposure LQ frames paired with one long-exposure GT
frame. Reference semantics reproduced here:

- phase-based scene split on the first character of the clip-folder name:
  train keeps folders starting with '0' or '2', val/test keeps '1'
  (SID_image_dataset.py:111-122);
- frames are stored as ``.npy`` uint8 arrays loaded via ``np.load`` and
  scaled to [0,1] (read_img2, SID_image_dataset.py:29-47) — plain image
  files are also accepted for convenience;
- stored channel order is BGR; emitted RGB (read_img_seq2 ``[2,1,0]`` swap);
- every frame is resized to ``train_size`` (cv2.resize, size given as
  (width, height), SID_image_dataset.py:36);
- the GT for every index in a clip is the clip's FIRST long-exposure frame
  (``imgs_GT[folder][0]``, SID_image_dataset.py:157-159);
- train augmentation is horizontal and/or vertical flip only — no crop, no
  rot90 (augment_torch, SID_image_dataset.py:73-89).

Output dict uses the repo-wide HWC float32 RGB numpy convention.
"""

from __future__ import annotations

import glob
import os
import random
from os import path as osp

import numpy as np

from ..utils.img_util import imread
from ..utils.registry import DATASET_REGISTRY


def _glob_file_list(root):
    return sorted(glob.glob(osp.join(root, "*")))


def _read_frame(path, train_size=None):
    """Load one SID frame as float32 HWC RGB in [0,1].

    ``.npy`` frames are uint8 BGR arrays (reference read_img2); anything else
    falls back to the normal image reader (already RGB).
    """
    if path.endswith(".npy"):
        img = np.load(path)
        if train_size is not None:
            import cv2

            img = cv2.resize(img, (train_size[0], train_size[1]))
        img = img.astype(np.float32) / 255.0
        if img.ndim == 2:
            img = img[:, :, None]
        if img.shape[2] > 3:
            img = img[:, :, :3]
        img = img[:, :, ::-1]  # BGR -> RGB
    else:
        img = imread(path)
        if train_size is not None:
            import cv2

            img = cv2.resize(img, (train_size[0], train_size[1]))
    return np.ascontiguousarray(img, dtype=np.float32)


@DATASET_REGISTRY.register()
class Dataset_SIDImage:
    def __init__(self, opt):
        self.opt = opt
        self.cache_data = opt.get("cache_data", False)
        self.half_N_frames = opt.get("N_frames", 1) // 2
        self.gt_root = opt["dataroot_gt"]
        self.lq_root = opt["dataroot_lq"]
        self.train_size = opt.get("train_size")  # (width, height)
        self.data_info = {"path_LQ": [], "path_GT": [], "folder": [], "idx": [],
                          "border": []}
        # folder -> ordered frame paths (reference caches paths, not pixels)
        self.imgs_lq, self.imgs_gt = {}, {}

        subfolders_lq_all = _glob_file_list(self.lq_root)
        subfolders_gt_all = _glob_file_list(self.gt_root)
        phase = opt.get("phase", "train")
        train_prefixes, val_prefixes = ("0", "2"), ("1",)
        keep = train_prefixes if phase == "train" else val_prefixes
        subfolders_lq, subfolders_gt = [], []
        for sub_lq, sub_gt in zip(subfolders_lq_all, subfolders_gt_all):
            name = osp.basename(sub_lq)
            if name[:1] in keep:
                subfolders_lq.append(sub_lq)
                subfolders_gt.append(sub_gt)

        for sub_lq, sub_gt in zip(subfolders_lq, subfolders_gt):
            folder = osp.basename(sub_lq)
            lq_paths = _glob_file_list(sub_lq)
            gt_paths = _glob_file_list(sub_gt)
            if not gt_paths:
                raise ValueError(f"SID clip {folder}: no GT frames in {sub_gt}")
            n = len(lq_paths)
            self.imgs_lq[folder] = lq_paths
            self.imgs_gt[folder] = gt_paths
            self.data_info["path_LQ"].extend(lq_paths)
            # reference pairs every LQ frame with the clip's first GT frame
            self.data_info["path_GT"].extend([gt_paths[0]] * n)
            self.data_info["folder"].extend([folder] * n)
            for i in range(n):
                self.data_info["idx"].append(f"{i}/{n}")
            border = [0] * n
            for i in range(self.half_N_frames):
                border[i] = 1
                border[n - i - 1] = 1
            self.data_info["border"].extend(border)

    def __getitem__(self, index):
        folder = self.data_info["folder"][index]
        idx = int(self.data_info["idx"][index].split("/")[0])
        lq = _read_frame(self.imgs_lq[folder][idx], self.train_size)
        gt = _read_frame(self.imgs_gt[folder][0], self.train_size)

        if self.opt.get("phase") == "train":
            # flip-only augmentation (reference augment_torch)
            if self.opt.get("use_flip", True) and random.random() < 0.5:
                lq, gt = lq[:, ::-1], gt[:, ::-1]
            if self.opt.get("use_rot", True) and random.random() < 0.5:
                lq, gt = lq[::-1], gt[::-1]

        return {
            "lq": np.ascontiguousarray(lq),
            "gt": np.ascontiguousarray(gt),
            "folder": folder,
            "idx": self.data_info["idx"][index],
            "border": self.data_info["border"][index],
            "lq_path": self.imgs_lq[folder][idx],
            "gt_path": self.imgs_gt[folder][0],
        }

    def __len__(self):
        return len(self.data_info["path_LQ"])
