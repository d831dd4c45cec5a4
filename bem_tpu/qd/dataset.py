"""QD paired dataset (reference: basicsr/QD/dataset.py:7-61).

Paired low/high folder loader with random crop + flips + rot90, channels-last.
"""

from __future__ import annotations

import os

import numpy as np

from ..utils.img_util import imread


class PairDataset:
    def __init__(self, low_dir: str, high_dir: str, patch_size: int = 256,
                 train: bool = True, seed=None):
        self.low_paths = sorted(
            os.path.join(low_dir, f) for f in os.listdir(low_dir)
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
        )
        self.high_paths = sorted(
            os.path.join(high_dir, f) for f in os.listdir(high_dir)
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
        )
        assert len(self.low_paths) == len(self.high_paths)
        self.patch_size = patch_size
        self.train = train
        self.rng = np.random.default_rng(seed)
        self.opt = {"name": "QDPair"}  # loader-facade compatibility

    def __len__(self):
        return len(self.low_paths)

    def __getitem__(self, idx):
        low = imread(self.low_paths[idx])
        high = imread(self.high_paths[idx])
        if self.train:
            p = self.patch_size
            h, w = low.shape[:2]
            if h < p or w < p:
                ph, pw = max(0, p - h), max(0, p - w)
                low = np.pad(low, ((0, ph), (0, pw), (0, 0)), mode="reflect")
                high = np.pad(high, ((0, ph), (0, pw), (0, 0)), mode="reflect")
                h, w = low.shape[:2]
            top = int(self.rng.integers(0, h - p + 1))
            left = int(self.rng.integers(0, w - p + 1))
            low = low[top : top + p, left : left + p]
            high = high[top : top + p, left : left + p]
            if self.rng.random() < 0.5:
                low, high = low[:, ::-1], high[:, ::-1]
            if self.rng.random() < 0.5:
                low, high = low[::-1], high[::-1]
            k = int(self.rng.integers(0, 4))
            low, high = np.rot90(low, k), np.rot90(high, k)
        return {
            "low": np.ascontiguousarray(low),
            "high": np.ascontiguousarray(high),
            "low_path": self.low_paths[idx],
            "high_path": self.high_paths[idx],
        }
