"""Paired crop / geometric augmentations (reference: basicsr/data/transforms.py)."""

from __future__ import annotations

from typing import List, Sequence, Union

import numpy as np


def mod_crop(img: np.ndarray, scale: int) -> np.ndarray:
    """Crop H, W to multiples of scale (transforms.py:6-23)."""
    if img.ndim in (2, 3):
        h, w = img.shape[0], img.shape[1]
        h_r, w_r = h % scale, w % scale
        return img[: h - h_r or None, : w - w_r or None, ...]
    raise ValueError(f"Wrong img ndim: {img.ndim}")


def paired_random_crop(img_gts, img_lqs, gt_patch_size, scale, gt_path=None,
                       rng: np.random.Generator = None):
    """Paired random crop, HWC numpy (transforms.py:26-137)."""
    rng = rng or np.random.default_rng()
    squeeze_gt = not isinstance(img_gts, list)
    squeeze_lq = not isinstance(img_lqs, list)
    if squeeze_gt:
        img_gts = [img_gts]
    if squeeze_lq:
        img_lqs = [img_lqs]

    h_lq, w_lq = img_lqs[0].shape[:2]
    h_gt, w_gt = img_gts[0].shape[:2]
    lq_patch_size = gt_patch_size // scale
    if h_gt != h_lq * scale or w_gt != w_lq * scale:
        raise ValueError(
            f"Scale mismatches. GT ({h_gt},{w_gt}) is not {scale}x of LQ ({h_lq},{w_lq})."
        )
    if h_lq < lq_patch_size or w_lq < lq_patch_size:
        raise ValueError(
            f"LQ ({h_lq},{w_lq}) is smaller than patch size ({lq_patch_size},"
            f"{lq_patch_size}). Path: {gt_path}."
        )
    top = int(rng.integers(0, h_lq - lq_patch_size + 1))
    left = int(rng.integers(0, w_lq - lq_patch_size + 1))
    img_lqs = [v[top : top + lq_patch_size, left : left + lq_patch_size, ...] for v in img_lqs]
    top_gt, left_gt = top * scale, left * scale
    img_gts = [
        v[top_gt : top_gt + gt_patch_size, left_gt : left_gt + gt_patch_size, ...]
        for v in img_gts
    ]
    if squeeze_gt:
        img_gts = img_gts[0]
    if squeeze_lq:
        img_lqs = img_lqs[0]
    return img_gts, img_lqs


def augment(imgs, hflip=True, rotation=True, flows=None, return_status=False,
            rng: np.random.Generator = None):
    """Random hflip/vflip/rot90, each p=0.5 (transforms.py:140-209)."""
    rng = rng or np.random.default_rng()
    hflip = hflip and rng.random() < 0.5
    vflip = rotation and rng.random() < 0.5
    rot90 = rotation and rng.random() < 0.5

    def _augment(img):
        if hflip:
            img = img[:, ::-1, ...]
        if vflip:
            img = img[::-1, :, ...]
        if rot90:
            img = img.transpose(1, 0, 2) if img.ndim == 3 else img.T
        return np.ascontiguousarray(img)

    def _augment_flow(flow):
        # flipping a flow map also negates the flipped component; rot90
        # swaps the (dx, dy) channels (reference transforms.py:172-184)
        flow = np.array(flow, copy=True)
        if hflip:
            flow = flow[:, ::-1]
            flow[:, :, 0] = -flow[:, :, 0]
        if vflip:
            flow = flow[::-1, :]
            flow[:, :, 1] = -flow[:, :, 1]
        if rot90:
            flow = flow.transpose(1, 0, 2)
            flow = flow[:, :, [1, 0]]
        return np.ascontiguousarray(flow)

    squeeze = not isinstance(imgs, list)
    if squeeze:
        imgs = [imgs]
    imgs = [_augment(i) for i in imgs]
    if squeeze:
        imgs = imgs[0]
    if flows is not None:
        f_squeeze = not isinstance(flows, list)
        if f_squeeze:
            flows = [flows]
        flows = [_augment_flow(f) for f in flows]
        if f_squeeze:
            flows = flows[0]
        return imgs, flows
    if return_status:
        return imgs, (hflip, vflip, rot90)
    return imgs


def data_augmentation(image: np.ndarray, mode: int) -> np.ndarray:
    """8 geometric variants (transforms.py:212-262)."""
    if mode == 0:
        out = image
    elif mode == 1:
        out = np.flipud(image)
    elif mode == 2:
        out = np.rot90(image)
    elif mode == 3:
        out = np.flipud(np.rot90(image))
    elif mode == 4:
        out = np.rot90(image, k=2)
    elif mode == 5:
        out = np.flipud(np.rot90(image, k=2))
    elif mode == 6:
        out = np.rot90(image, k=3)
    elif mode == 7:
        out = np.flipud(np.rot90(image, k=3))
    else:
        raise ValueError("Invalid choice of image transformation")
    return np.ascontiguousarray(out)


def random_augmentation(*args, rng: np.random.Generator = None):
    """Same random geometric variant applied to all inputs (transforms.py:276-281)."""
    rng = rng or np.random.default_rng()
    mode = int(rng.integers(0, 8))
    return [data_augmentation(a, mode) for a in args]
