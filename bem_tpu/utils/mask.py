"""MIM random patch mask (reference: basicsr/utils/mask.py:3-27)."""

from __future__ import annotations

import numpy as np


class MaskGenerator:
    def __init__(self, input_size=192, mask_patch_size=32, model_patch_size=4,
                 mask_ratio=0.6, rng: np.random.Generator = None):
        self.input_size = input_size
        self.mask_patch_size = mask_patch_size
        self.model_patch_size = model_patch_size
        self.mask_ratio = mask_ratio
        assert self.input_size % self.mask_patch_size == 0
        assert self.mask_patch_size % self.model_patch_size == 0
        self.rand_size = self.input_size // self.mask_patch_size
        self.scale = self.mask_patch_size // self.model_patch_size
        self.token_count = self.rand_size**2
        self.mask_count = int(np.ceil(self.token_count * self.mask_ratio))
        self.rng = rng or np.random.default_rng()

    def __call__(self) -> np.ndarray:
        mask_idx = self.rng.permutation(self.token_count)[: self.mask_count]
        mask = np.zeros(self.token_count, dtype=np.int32)
        mask[mask_idx] = 1
        mask = mask.reshape(self.rand_size, self.rand_size)
        return mask.repeat(self.scale, axis=0).repeat(self.scale, axis=1)
