"""BT.601 color conversions (reference: basicsr/utils/color_util.py)."""

from __future__ import annotations

import numpy as np


def _to_float(img: np.ndarray) -> np.ndarray:
    """uint8 [0,255] or float [0,1] -> float32 [0,1]."""
    img = img.astype(np.float32)
    if img.max() > 1.5:  # heuristic not needed: follow reference rules
        pass
    return img


def _convert_input(img):
    img_type = img.dtype
    img = img.astype(np.float32)
    if img_type != np.uint8:
        img *= 255.0
    return img, img_type


def _convert_output(img, img_type):
    if img_type == np.uint8:
        return img.round().astype(np.uint8)
    return (img / 255.0).astype(np.float32)


def rgb2ycbcr(img: np.ndarray, y_only: bool = False) -> np.ndarray:
    img, img_type = _convert_input(img)
    img = img / 255.0
    if y_only:
        out = np.dot(img, [65.481, 128.553, 24.966]) + 16.0
    else:
        out = np.matmul(
            img,
            [[65.481, -37.797, 112.0],
             [128.553, -74.203, -93.786],
             [24.966, 112.0, -18.214]],
        ) + [16, 128, 128]
    return _convert_output(out, img_type)


def bgr2ycbcr(img: np.ndarray, y_only: bool = False) -> np.ndarray:
    img, img_type = _convert_input(img)
    img = img / 255.0
    if y_only:
        out = np.dot(img, [24.966, 128.553, 65.481]) + 16.0
    else:
        out = np.matmul(
            img,
            [[24.966, 112.0, -18.214],
             [128.553, -74.203, -93.786],
             [65.481, -37.797, 112.0]],
        ) + [16, 128, 128]
    return _convert_output(out, img_type)


def ycbcr2rgb(img: np.ndarray) -> np.ndarray:
    img, img_type = _convert_input(img)
    out = np.matmul(
        img,
        [[0.00456621, 0.00456621, 0.00456621],
         [0, -0.00153632, 0.00791071],
         [0.00625893, -0.00318811, 0]],
    ) * 255.0 + [-222.921, 135.576, -276.836]
    return _convert_output(out, img_type)


def ycbcr2bgr(img: np.ndarray) -> np.ndarray:
    return ycbcr2rgb(img)[..., ::-1]
