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
from ..utils.flow_util import dequantize_flow
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
        self.flow_root = opt.get("dataroot_flow")
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
        img_flows = None
        if self.flow_root is not None:
            # quantized flows (uint8 dx/dy stacked on axis 0, max_val=20,
            # denorm=False) for the center frame's _p/_n neighbors
            # (reds_dataset.py:143-167)
            img_flows = []
            for rng_, tag in ((range(self.num_half_frames, 0, -1), "p"),
                              (range(1, self.num_half_frames + 1), "n")):
                for i in rng_:
                    fpath = osp.join(self.flow_root, clip_name,
                                     f"{frame_name}_{tag}{i}.png")
                    cat_flow = imfrombytes(
                        self.file_client.get(fpath, "flow"),
                        flag="grayscale", float32=False)
                    dx, dy = np.split(cat_flow, 2, axis=0)
                    img_flows.append(
                        dequantize_flow(dx, dy, max_val=20, denorm=False))
            # crop flows jointly with the LQ frames (same spatial size)
            img_lqs.extend(img_flows)

        img_gt, img_lqs = paired_random_crop(img_gt, img_lqs, gt_size, scale, gt_path)
        if img_flows is not None:
            img_lqs, img_flows = (img_lqs[: self.num_frame],
                                  img_lqs[self.num_frame:])
            imgs, img_flows = augment(
                img_lqs + [img_gt], self.opt.get("use_hflip", True),
                self.opt.get("use_rot", True), img_flows)
        else:
            imgs = augment(img_lqs + [img_gt], self.opt.get("use_hflip", True),
                           self.opt.get("use_rot", True))
        img_lqs = np.stack([img2tensor(i) for i in imgs[:-1]])
        img_gt = img2tensor(imgs[-1])
        if img_flows is not None:
            # zero center flow inserted at the middle position
            img_flows = [f.astype(np.float32) for f in img_flows]
            img_flows.insert(self.num_half_frames,
                             np.zeros_like(img_flows[0]))
            flows = np.stack(img_flows)
            return {"lq": img_lqs, "flow": flows, "gt": img_gt,
                    "key": self.keys[index]}
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


def generate_gaussian_kernel(kernel_size=13, sigma=1.6):
    """Gaussian kernel for duf_downsample (data_util.py:340-355)."""
    from scipy.ndimage import gaussian_filter

    kernel = np.zeros((kernel_size, kernel_size))
    kernel[kernel_size // 2, kernel_size // 2] = 1
    return gaussian_filter(kernel, sigma)


def duf_downsample(x: np.ndarray, kernel_size: int = 13, scale: int = 4):
    """DUF-official Gaussian blur + stride-subsample (data_util.py:358-390).

    Args:
        x: frames, (T, H, W, C) channels-last float.
    Returns (T, H/scale, W/scale, C).
    """
    assert scale in (2, 3, 4), f"Only support scale (2, 3, 4), but got {scale}."
    pad = kernel_size // 2 + scale * 2
    kern = generate_gaussian_kernel(kernel_size, 0.4 * scale).astype(x.dtype)
    t, h, w, c = x.shape
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    kh, kw = kern.shape
    # strided conv per channel (host-side numpy; tiny test-time op)
    oh = (xp.shape[1] - kh) // scale + 1
    ow = (xp.shape[2] - kw) // scale + 1
    out = np.empty((t, oh, ow, c), dtype=x.dtype)
    sw = np.lib.stride_tricks.sliding_window_view(xp, (kh, kw), axis=(1, 2))
    sw = sw[:, ::scale, ::scale]  # (T, oh, ow, C, kh, kw)
    out = np.einsum("thwcij,ij->thwc", sw, kern)
    return out[:, 2:-2, 2:-2]


@DATASET_REGISTRY.register()
class REDSRecurrentDataset:
    """REDS clips for recurrent nets: num_frame consecutive frames at a
    random temporal interval, same crop/augs across the window
    (reds_dataset.py:209-352)."""

    def __init__(self, opt):
        self.opt = opt
        self.gt_root = opt["dataroot_gt"]
        self.lq_root = opt["dataroot_lq"]
        self.num_frame = opt["num_frame"]
        with open(opt["meta_info_file"]) as f:
            self.keys = []
            for line in f:
                folder, frame_num, _ = line.split(" ")
                self.keys.extend(f"{folder}/{i:08d}" for i in range(int(frame_num)))
        if opt.get("val_partition", "REDS4") == "REDS4":
            val_partition = ["000", "011", "015", "020"]
        elif opt["val_partition"] == "official":
            val_partition = [f"{v:03d}" for v in range(240, 270)]
        else:
            raise ValueError(f"Wrong validation partition {opt['val_partition']}.")
        if opt.get("test_mode"):
            self.keys = [v for v in self.keys if v.split("/")[0] in val_partition]
        else:
            self.keys = [v for v in self.keys if v.split("/")[0] not in val_partition]
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
        interval = random.choice(self.interval_list)
        start = int(frame_name)
        limit = self.frames_per_clip - self.num_frame * interval
        if start > limit:
            start = random.randint(0, limit)
        neighbors = list(range(start, start + self.num_frame * interval, interval))
        if self.random_reverse and random.random() < 0.5:
            neighbors.reverse()

        img_lqs, img_gts = [], []
        for n in neighbors:
            lq_path = osp.join(self.lq_root, clip_name, f"{n:08d}.png")
            gt_path = osp.join(self.gt_root, clip_name, f"{n:08d}.png")
            img_lqs.append(imfrombytes(self.file_client.get(lq_path, "lq"), float32=True))
            img_gts.append(imfrombytes(self.file_client.get(gt_path, "gt"), float32=True))
        img_gts, img_lqs = paired_random_crop(img_gts, img_lqs, gt_size, scale, gt_path)
        imgs = augment(img_lqs + img_gts, self.opt.get("use_hflip", True),
                       self.opt.get("use_rot", True))
        t = len(neighbors)
        return {
            "lq": np.stack([img2tensor(i) for i in imgs[:t]]),
            "gt": np.stack([img2tensor(i) for i in imgs[t:]]),
            "key": self.keys[index],
        }

    def __len__(self):
        return len(self.keys)


@DATASET_REGISTRY.register()
class Vimeo90KRecurrentDataset(Vimeo90KDataset):
    """Vimeo90K septuplets for recurrent nets: all 7 frames as both LQ and GT
    sequences, optional sequence flip to 14 (vimeo90k_dataset.py:137-199)."""

    def __init__(self, opt):
        super().__init__(opt)
        self.flip_sequence = opt.get("flip_sequence", False)
        self.neighbor_list = [1, 2, 3, 4, 5, 6, 7]

    def __getitem__(self, index):
        if self.file_client is None:
            io_opt = dict(self.io_backend_opt)
            self.file_client = FileClient(io_opt.pop("type"), **io_opt)
        if self.random_reverse and random.random() < 0.5:
            self.neighbor_list.reverse()
        scale = self.opt["scale"]
        gt_size = self.opt["gt_size"]
        key = self.keys[index]
        clip, seq = key.split("/")
        img_lqs, img_gts = [], []
        for n in self.neighbor_list:
            lq_path = osp.join(self.lq_root, clip, seq, f"im{n}.png")
            gt_path = osp.join(self.gt_root, clip, seq, f"im{n}.png")
            img_lqs.append(imfrombytes(self.file_client.get(lq_path, "lq"), float32=True))
            img_gts.append(imfrombytes(self.file_client.get(gt_path, "gt"), float32=True))
        img_gts, img_lqs = paired_random_crop(img_gts, img_lqs, gt_size, scale, gt_path)
        imgs = augment(img_lqs + img_gts, self.opt.get("use_hflip", True),
                       self.opt.get("use_rot", True))
        lq = np.stack([img2tensor(i) for i in imgs[:7]])
        gt = np.stack([img2tensor(i) for i in imgs[7:]])
        if self.flip_sequence:
            lq = np.concatenate([lq, lq[::-1]], axis=0)
            gt = np.concatenate([gt, gt[::-1]], axis=0)
        return {"lq": lq, "gt": gt, "key": key}


@DATASET_REGISTRY.register()
class VideoTestVimeo90KDataset:
    """Vimeo90K-Test: center frame GT with its neighbor window
    (video_test_dataset.py:134-199)."""

    def __init__(self, opt):
        self.opt = opt
        if opt.get("cache_data"):
            raise NotImplementedError(
                "cache_data in Vimeo90K-Test dataset is not implemented.")
        self.gt_root = opt["dataroot_gt"]
        self.lq_root = opt["dataroot_lq"]
        self.data_info = {"lq_path": [], "gt_path": [], "folder": [], "idx": [],
                          "border": []}
        neighbor_list = [i + (9 - opt["num_frame"]) // 2 for i in range(opt["num_frame"])]
        with open(opt["meta_info_file"]) as fin:
            subfolders = [line.split(" ")[0] for line in fin if line.strip()]
        for idx, subfolder in enumerate(subfolders):
            self.data_info["gt_path"].append(osp.join(self.gt_root, subfolder, "im4.png"))
            self.data_info["lq_path"].append(
                [osp.join(self.lq_root, subfolder, f"im{i}.png") for i in neighbor_list])
            self.data_info["folder"].append("vimeo90k")
            self.data_info["idx"].append(f"{idx}/{len(subfolders)}")
            self.data_info["border"].append(0)

    def __getitem__(self, index):
        from ..utils.img_util import imread

        lq_paths = self.data_info["lq_path"][index]
        imgs_lq = np.stack([imread(p) for p in lq_paths])
        img_gt = imread(self.data_info["gt_path"][index])
        return {
            "lq": imgs_lq,
            "gt": img_gt,
            "folder": self.data_info["folder"][index],
            "idx": self.data_info["idx"][index],
            "border": self.data_info["border"][index],
            "lq_path": lq_paths[self.opt["num_frame"] // 2],
        }

    def __len__(self):
        return len(self.data_info["gt_path"])


@DATASET_REGISTRY.register()
class VideoTestDUFDataset(VideoTestDataset):
    """DUF test variant: optionally synthesizes LQ by Gaussian-blur
    downsampling the GT window (video_test_dataset.py:202-249)."""

    def __getitem__(self, index):
        from ..utils.img_util import imread
        from .transforms import mod_crop

        folder = self.data_info["folder"][index]
        idx, max_idx = map(int, self.data_info["idx"][index].split("/"))
        select = generate_frame_indices(
            idx, max_idx, self.opt["num_frame"],
            padding=self.opt.get("padding", "reflection"),
        )
        scale = self.opt["scale"]
        if self.opt.get("use_duf_downsampling"):
            gt_frames = np.stack(
                [mod_crop(imread(self.imgs_gt[folder][i]), scale) for i in select])
            imgs_lq = duf_downsample(gt_frames, kernel_size=13, scale=scale)
        else:
            imgs_lq = np.stack([imread(self.imgs_lq[folder][i]) for i in select])
        img_gt = mod_crop(imread(self.data_info["gt_path"][index]), scale)
        return {
            "lq": imgs_lq,
            "gt": img_gt,
            "folder": folder,
            "idx": self.data_info["idx"][index],
            "border": self.data_info["border"][index],
            "lq_path": self.data_info["lq_path"][index],
        }


@DATASET_REGISTRY.register()
class VideoRecurrentTestDataset(VideoTestDataset):
    """Whole clips as single samples for recurrent nets
    (video_test_dataset.py:252-290)."""

    def __init__(self, opt):
        super().__init__(opt)
        self.folders = sorted(set(self.data_info["folder"]))

    def __getitem__(self, index):
        from ..utils.img_util import imread

        folder = self.folders[index]
        imgs_lq = np.stack([imread(p) for p in self.imgs_lq[folder]])
        imgs_gt = np.stack([imread(p) for p in self.imgs_gt[folder]])
        return {"lq": imgs_lq, "gt": imgs_gt, "folder": folder}

    def __len__(self):
        return len(self.folders)
