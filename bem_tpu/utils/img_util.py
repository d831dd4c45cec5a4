"""Image IO / conversion utilities (reference: basicsr/utils/img_util.py).

Channels-last float [0,1] RGB is the canonical in-framework format (the
reference uses CHW tensors; img2tensor/tensor2img here map between disk
(BGR uint8 via cv2) and that canonical format).
"""

from __future__ import annotations

import os
from typing import List, Union

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def imfrombytes(content: bytes, flag: str = "color", float32: bool = False) -> np.ndarray:
    """Decode image bytes -> BGR HWC uint8 (img_util.py:114-133)."""
    img_np = np.frombuffer(content, np.uint8)
    imread_flags = {
        "color": cv2.IMREAD_COLOR,
        "grayscale": cv2.IMREAD_GRAYSCALE,
        "unchanged": cv2.IMREAD_UNCHANGED,
    }
    img = cv2.imdecode(img_np, imread_flags[flag])
    if float32:
        img = img.astype(np.float32) / 255.0
    return img


def imfrombytesDP(content: bytes, float32: bool = False) -> np.ndarray:
    """Decode 16-bit image bytes (dual-pixel data) -> HWC array; float32
    normalizes by 65535 (img_util.py:175-194)."""
    img_np = np.frombuffer(content, np.uint8)
    img = cv2.imdecode(img_np, cv2.IMREAD_UNCHANGED)
    if float32:
        img = img.astype(np.float32) / 65535.0
    return img


def img2tensor(img: np.ndarray, bgr2rgb: bool = True, float32: bool = True) -> np.ndarray:
    """BGR HWC [0,1] -> RGB HWC float32 (canonical NHWC; img_util.py:9-35)."""
    if img.ndim == 2:
        img = img[..., None]
    if bgr2rgb and img.shape[2] == 3:
        img = img[..., ::-1]
    img = np.ascontiguousarray(img)
    return img.astype(np.float32) if float32 else img


def tensor2img(
    tensor: Union[np.ndarray, List[np.ndarray]],
    rgb2bgr: bool = True,
    min_max=(0, 1),
) -> np.ndarray:
    """HWC float (canonical RGB) -> HWC uint8, optionally BGR for cv2.imwrite
    (img_util.py:38-111)."""
    if isinstance(tensor, (list, tuple)):
        tensor = tensor[0]
    img = np.asarray(tensor, np.float32)
    if img.ndim == 4:
        img = img[0]
    img = np.clip(img, min_max[0], min_max[1])
    img = (img - min_max[0]) / (min_max[1] - min_max[0])
    if rgb2bgr and img.ndim == 3 and img.shape[2] == 3:
        img = img[..., ::-1]
    return (img * 255.0).round().astype(np.uint8)


def imwrite(img: np.ndarray, file_path: str, params=None, auto_mkdir: bool = True) -> bool:
    if auto_mkdir:
        os.makedirs(os.path.dirname(os.path.abspath(file_path)), exist_ok=True)
    return cv2.imwrite(file_path, img, params or [])


def imread(file_path: str, float32: bool = True, bgr2rgb: bool = True) -> np.ndarray:
    """Read from disk -> canonical RGB HWC float [0,1]."""
    img = cv2.imread(file_path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(file_path)
    img = img.astype(np.float32) / 255.0
    return img2tensor(img, bgr2rgb=bgr2rgb)


def padding(img_lq: np.ndarray, img_gt: np.ndarray, gt_size: int):
    """Reflect-pad both images up to gt_size (img_util.py:196-214), HWC."""
    h, w = img_lq.shape[:2]
    h_pad = max(0, gt_size - h)
    w_pad = max(0, gt_size - w)
    if h_pad == 0 and w_pad == 0:
        return img_lq, img_gt
    img_lq = cv2.copyMakeBorder(img_lq, 0, h_pad, 0, w_pad, cv2.BORDER_REFLECT)
    img_gt = cv2.copyMakeBorder(img_gt, 0, h_pad, 0, w_pad, cv2.BORDER_REFLECT)
    return img_lq, img_gt


def padding_DP(img_lqL, img_lqR, img_gt, gt_size: int):
    """Reflect-pad a dual-pixel triple up to gt_size (img_util.py:213-226)."""
    h, w = img_gt.shape[:2]
    h_pad = max(0, gt_size - h)
    w_pad = max(0, gt_size - w)
    if h_pad == 0 and w_pad == 0:
        return img_lqL, img_lqR, img_gt
    img_lqL = cv2.copyMakeBorder(img_lqL, 0, h_pad, 0, w_pad, cv2.BORDER_REFLECT)
    img_lqR = cv2.copyMakeBorder(img_lqR, 0, h_pad, 0, w_pad, cv2.BORDER_REFLECT)
    img_gt = cv2.copyMakeBorder(img_gt, 0, h_pad, 0, w_pad, cv2.BORDER_REFLECT)
    return img_lqL, img_lqR, img_gt
