"""Metric helpers (reference: basicsr/metrics/metric_util.py, utils/color_util.py)."""

from __future__ import annotations

import numpy as np


def reorder_image(img: np.ndarray, input_order: str = "HWC") -> np.ndarray:
    if input_order not in ("HWC", "CHW"):
        raise ValueError(f"Wrong input_order {input_order}")
    if img.ndim == 2:
        return img[..., None]
    if input_order == "CHW":
        return img.transpose(1, 2, 0)
    return img


def rgb2ycbcr(img: np.ndarray, y_only: bool = False) -> np.ndarray:
    """BT.601 full-range rgb->ycbcr on [0,1] float images (color_util.py)."""
    if y_only:
        out = np.dot(img, [65.481, 128.553, 24.966]) + 16.0
        return out[..., None] if out.ndim == 2 else out
    out = np.matmul(
        img,
        np.array(
            [
                [65.481, -37.797, 112.0],
                [128.553, -74.203, -93.786],
                [24.966, 112.0, -18.214],
            ]
        ),
    ) + [16, 128, 128]
    return out


def to_y_channel(img: np.ndarray) -> np.ndarray:
    """[0,255] HWC -> Y channel [0,255] like reference to_y_channel."""
    img = img.astype(np.float32) / 255.0
    if img.ndim == 3 and img.shape[2] == 3:
        img = rgb2ycbcr(img, y_only=True)
        img = img[..., None]
    return img * 255.0
