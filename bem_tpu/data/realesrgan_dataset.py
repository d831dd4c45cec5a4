"""Real-ESRGAN on-the-fly degradation dataset
(reference: basicsr/data/realesrgan_dataset.py, 193 LoC).

GT-only dataset that emits the GT crop plus the two random blur kernels and
the sinc kernel for the in-training degradation pipeline (the model applies
them on device).
"""

from __future__ import annotations

import math
import random

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from ..utils.file_client import FileClient
from ..utils.img_util import imfrombytes, img2tensor
from ..utils.registry import DATASET_REGISTRY
from .data_util import scandir
from .degradations import circular_lowpass_kernel, random_mixed_kernels
from .transforms import augment


@DATASET_REGISTRY.register()
class RealESRGANDataset:
    def __init__(self, opt):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt["io_backend"])
        self.gt_folder = opt["dataroot_gt"]
        if self.opt.get("meta_info"):
            with open(self.opt["meta_info"]) as f:
                self.paths = [
                    f"{self.gt_folder}/{line.strip()}" for line in f if line.strip()
                ]
        else:
            self.paths = sorted(scandir(self.gt_folder, full_path=True))

        # first + second degradation kernel settings
        self.blur_kernel_size = opt["blur_kernel_size"]
        self.kernel_list = opt["kernel_list"]
        self.kernel_prob = opt["kernel_prob"]
        self.blur_sigma = opt["blur_sigma"]
        self.betag_range = opt["betag_range"]
        self.betap_range = opt["betap_range"]
        self.sinc_prob = opt["sinc_prob"]
        self.blur_kernel_size2 = opt["blur_kernel_size2"]
        self.kernel_list2 = opt["kernel_list2"]
        self.kernel_prob2 = opt["kernel_prob2"]
        self.blur_sigma2 = opt["blur_sigma2"]
        self.betag_range2 = opt["betag_range2"]
        self.betap_range2 = opt["betap_range2"]
        self.sinc_prob2 = opt["sinc_prob2"]
        self.final_sinc_prob = opt["final_sinc_prob"]
        self.kernel_range = [2 * v + 1 for v in range(3, 11)]  # 7..21
        self.pulse_tensor = np.zeros((21, 21), np.float32)
        self.pulse_tensor[10, 10] = 1.0

    def _random_kernel(self, kernel_list, kernel_prob, blur_sigma, betag, betap,
                       sinc_prob):
        kernel_size = random.choice(self.kernel_range)
        if np.random.uniform() < sinc_prob:
            omega_c = (np.random.uniform(np.pi / 3, np.pi) if kernel_size < 13
                       else np.random.uniform(np.pi / 5, np.pi))
            kernel = circular_lowpass_kernel(omega_c, kernel_size, pad_to=0)
        else:
            kernel = random_mixed_kernels(
                kernel_list, kernel_prob, kernel_size, blur_sigma, blur_sigma,
                (-math.pi, math.pi), betag, betap, noise_range=None,
            )
        pad = (21 - kernel_size) // 2
        return np.pad(kernel, ((pad, pad), (pad, pad))).astype(np.float32)

    def __getitem__(self, index):
        if self.file_client is None:
            io_opt = dict(self.io_backend_opt)
            self.file_client = FileClient(io_opt.pop("type"), **io_opt)
        gt_path = self.paths[index % len(self.paths)]
        img_gt = imfrombytes(self.file_client.get(gt_path, "gt"), float32=True)
        img_gt = augment(img_gt, self.opt.get("use_hflip", True),
                         self.opt.get("use_rot", True))

        crop_pad_size = self.opt.get("crop_pad_size", 400)
        h, w = img_gt.shape[:2]
        if h < crop_pad_size or w < crop_pad_size:
            img_gt = cv2.copyMakeBorder(
                img_gt, 0, max(0, crop_pad_size - h), 0, max(0, crop_pad_size - w),
                cv2.BORDER_REFLECT_101,
            )
        h, w = img_gt.shape[:2]
        if h > crop_pad_size or w > crop_pad_size:
            top = random.randint(0, h - crop_pad_size)
            left = random.randint(0, w - crop_pad_size)
            img_gt = img_gt[top : top + crop_pad_size, left : left + crop_pad_size]

        kernel = self._random_kernel(self.kernel_list, self.kernel_prob,
                                     self.blur_sigma, self.betag_range,
                                     self.betap_range, self.sinc_prob)
        kernel2 = self._random_kernel(self.kernel_list2, self.kernel_prob2,
                                      self.blur_sigma2, self.betag_range2,
                                      self.betap_range2, self.sinc_prob2)
        if np.random.uniform() < self.final_sinc_prob:
            kernel_size = random.choice(self.kernel_range)
            omega_c = np.random.uniform(np.pi / 3, np.pi)
            sinc_kernel = circular_lowpass_kernel(
                omega_c, kernel_size, pad_to=21
            ).astype(np.float32)
        else:
            sinc_kernel = self.pulse_tensor

        return {
            "gt": img2tensor(img_gt),
            "kernel1": kernel,
            "kernel2": kernel2,
            "sinc_kernel": sinc_kernel,
            "gt_path": gt_path,
        }

    def __len__(self):
        return len(self.paths)
