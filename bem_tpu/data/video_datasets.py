"""Video restoration datasets (EDVR-era BasicSR legacy).

Parity targets: basicsr/data/reds_dataset.py (REDSDataset:29), vimeo90k_
dataset.py (Vimeo90KDataset), video_test_dataset.py (VideoTestDataset:14).
Clips are stacked along a leading frame axis; images channels-last float32.
"""

from __future__ import annotations

import os
import random
from os import path as osp

import numpy as np

from ..utils.file_client import FileClient
from ..utils.img_util import imfrombytes, img2tensor
from ..utils.registry import DATASET_REGISTRY
from .data_util import scandir
from .transforms import augment, paired_random_crop


def generate_frame_indices(crt_idx, max_frame_num, num_frames, padding="reflection"):
    """Neighboring frame indices with border padding
    (reference data_util.generate_frame_indices)."""
    assert num_frames % 2 == 1
    assert padding in ("replicate", "reflection", "reflection_circle", "circle")
    max_frame_num = max_frame_num - 1
    num_pad = num_frames // 2
    indices = []
    for i in range(crt_idx - num_pad, crt_idx + num_pad + 1):
        if i < 0:
            if padding == "replicate":
                pad_idx = 0
            elif padding == "reflection":
                pad_idx = -i
            elif padding == "reflection_circle":
                pad_idx = crt_idx + num_pad - i
            else:
                pad_idx = num_frames + i
        elif i > max_frame_num:
            if padding == "replicate":
                pad_idx = max_frame_num
            elif padding == "reflection":
                pad_idx = max_frame_num * 2 - i
            elif padding == "reflection_circle":
                pad_idx = (crt_idx - num_pad) - (i - max_frame_num)
            else:
                pad_idx = i - num_frames
        else:
            pad_idx = i
        indices.append(pad_idx)
    return indices


@DATASET_REGISTRY.register()
class REDSDataset:
    """REDS training: GT center frame + num_frame LQ neighbors with random
    temporal interval and optional reversal (reds_dataset.py:95-160)."""

    def __init__(self, opt):
        self.opt = opt
        self.gt_root = opt["dataroot_gt"]
        self.lq_root = opt["dataroot_lq"]
        assert opt["num_frame"] % 2 == 1
        self.num_frame = opt["num_frame"]
        self.num_half_frames = opt["num_frame"] // 2
        with open(opt["meta_info_file"]) as f:
            self.keys = []
            for line in f:
                folder, frame_num, _ = line.split(" ")
                self.keys.extend(f"{folder}/{i:08d}" for i in range(int(frame_num)))
        # REDS4 val-partition handling (reds_dataset.py:62-71)
        val_partition = (
            ["000", "011", "015", "020"]
            if opt.get("val_partition", "REDS4") == "REDS4"
            else [f"{v:03d}" for v in range(240, 270)]
        )
        if opt["phase"] == "train":
            self.keys = [k for k in self.keys if k.split("/")[0] not in val_partition]
        else:
            self.keys = [k for k in self.keys if k.split("/")[0] in val_partition]
        self.file_client = None
        self.io_backend_opt = dict(opt["io_backend"])
        self.interval_list = opt.get("interval_list", [1])
        self.random_reverse = opt.get("random_reverse", False)
        self.frames_per_clip = opt.get("frames_per_clip", 100)

    def __getitem__(self, index):
        if self.file_client is None:
            io_opt = dict(self.io_backend_opt)
            self.file_client = FileClient(io_opt.pop("type"), **io_opt)
        scale = self.opt["scale"]
        gt_size = self.opt["gt_size"]
        clip_name, frame_name = self.keys[index].split("/")
        center = int(frame_name)
        interval = random.choice(self.interval_list)
        last = self.frames_per_clip - 1
        start = center - self.num_half_frames * interval
        end = center + self.num_half_frames * interval
        while start < 0 or end > last:
            center = random.randint(0, last)
            start = center - self.num_half_frames * interval
            end = center + self.num_half_frames * interval
        neighbors = list(range(start, end + 1, interval))
        if self.random_reverse and random.random() < 0.5:
            neighbors.reverse()

        gt_path = osp.join(self.gt_root, clip_name, f"{center:08d}.png")
        img_gt = imfrombytes(self.file_client.get(gt_path, "gt"), float32=True)
        img_lqs = [
            imfrombytes(
                self.file_client.get(
                    osp.join(self.lq_root, clip_name, f"{n:08d}.png"), "lq"
                ),
                float32=True,
            )
            for n in neighbors
        ]
        img_gt, img_lqs = paired_random_crop(img_gt, img_lqs, gt_size, scale, gt_path)
        imgs = augment(img_lqs + [img_gt], self.opt.get("use_hflip", True),
                       self.opt.get("use_rot", True))
        img_lqs = np.stack([img2tensor(i) for i in imgs[:-1]])
        img_gt = img2tensor(imgs[-1])
        return {"lq": img_lqs, "gt": img_gt, "key": self.keys[index]}

    def __len__(self):
        return len(self.keys)


@DATASET_REGISTRY.register()
class Vimeo90KDataset:
    """Vimeo90K septuplets (vimeo90k_dataset.py): GT = frame 4, LQ = the
    num_frame neighbors selected from the 7."""

    def __init__(self, opt):
        self.opt = opt
        self.gt_root = opt["dataroot_gt"]
        self.lq_root = opt["dataroot_lq"]
        with open(opt["meta_info_file"]) as f:
            self.keys = [line.strip().split(" ")[0] for line in f if line.strip()]
        self.file_client = None
        self.io_backend_opt = dict(opt["io_backend"])
        self.neighbor_list = [
            i + (9 - opt["num_frame"]) // 2 for i in range(opt["num_frame"])
        ]
        self.random_reverse = opt.get("random_reverse", False)

    def __getitem__(self, index):
        if self.file_client is None:
            io_opt = dict(self.io_backend_opt)
            self.file_client = FileClient(io_opt.pop("type"), **io_opt)
        scale = self.opt["scale"]
        gt_size = self.opt["gt_size"]
        key = self.keys[index]
        clip, seq = key.split("/")
        gt_path = osp.join(self.gt_root, clip, seq, "im4.png")
        img_gt = imfrombytes(self.file_client.get(gt_path, "gt"), float32=True)
        neighbors = list(self.neighbor_list)
        if self.random_reverse and random.random() < 0.5:
            neighbors.reverse()
        img_lqs = [
            imfrombytes(
                self.file_client.get(
                    osp.join(self.lq_root, clip, seq, f"im{n}.png"), "lq"
                ),
                float32=True,
            )
            for n in neighbors
        ]
        img_gt, img_lqs = paired_random_crop(img_gt, img_lqs, gt_size, scale, gt_path)
        imgs = augment(img_lqs + [img_gt], self.opt.get("use_hflip", True),
                       self.opt.get("use_rot", True))
        return {
            "lq": np.stack([img2tensor(i) for i in imgs[:-1]]),
            "gt": img2tensor(imgs[-1]),
            "key": key,
        }

    def __len__(self):
        return len(self.keys)


@DATASET_REGISTRY.register()
class VideoTestDataset:
    """Whole-clip testing: every frame with its padded neighbor window
    (video_test_dataset.py:14-150)."""

    def __init__(self, opt):
        self.opt = opt
        self.gt_root = opt["dataroot_gt"]
        self.lq_root = opt["dataroot_lq"]
        self.file_client = None
        self.io_backend_opt = dict(opt["io_backend"])
        self.data_info = {"lq_path": [], "gt_path": [], "folder": [], "idx": [],
                          "border": []}
        clips = sorted(os.listdir(self.lq_root))
        self.imgs_lq, self.imgs_gt = {}, {}
        for clip in clips:
            lq_frames = sorted(
                scandir(osp.join(self.lq_root, clip), full_path=True)
            )
            gt_frames = sorted(
                scandir(osp.join(self.gt_root, clip), full_path=True)
            )
            n = len(lq_frames)
            self.imgs_lq[clip] = lq_frames
            self.imgs_gt[clip] = gt_frames
            for i in range(n):
                self.data_info["lq_path"].append(lq_frames[i])
                self.data_info["gt_path"].append(gt_frames[i])
                self.data_info["folder"].append(clip)
                self.data_info["idx"].append(f"{i}/{n}")
                border = 1 if (
                    i < self.opt["num_frame"] // 2 or i >= n - self.opt["num_frame"] // 2
                ) else 0
                self.data_info["border"].append(border)

    def __getitem__(self, index):
        folder = self.data_info["folder"][index]
        idx, max_idx = map(int, self.data_info["idx"][index].split("/"))
        select = generate_frame_indices(
            idx, max_idx, self.opt["num_frame"],
            padding=self.opt.get("padding", "reflection"),
        )
        from ..utils.img_util import imread

        img_lqs = np.stack(
            [img2tensor(imfrombytes(open(self.imgs_lq[folder][i], "rb").read(),
                                    float32=True))
             for i in select]
        )
        img_gt = img2tensor(
            imfrombytes(open(self.data_info["gt_path"][index], "rb").read(),
                        float32=True)
        )
        return {
            "lq": img_lqs,
            "gt": img_gt,
            "folder": folder,
            "idx": self.data_info["idx"][index],
            "border": self.data_info["border"][index],
            "lq_path": self.data_info["lq_path"][index],
        }

    def __len__(self):
        return len(self.data_info["gt_path"])
