"""Optical-flow file IO (reference: basicsr/utils/flow_util.py, 170 LoC).

Quantized flows are stored as a single uint8 image with dx/dy concatenated
along ``concat_axis`` (reference flowread/flowwrite quantize branches);
[de]quantization follows the mmcv formulas (quantize: floor to ``levels``
buckets over [-max_val, max_val]; dequantize: bucket centers).
"""

from __future__ import annotations

import os

import numpy as np


def quantize(arr, min_val, max_val, levels, dtype=np.int64):
    """Quantize (-inf, inf) to [0, levels-1] (flow_util.py:127-148)."""
    if not (isinstance(levels, int) and levels > 1):
        raise ValueError(f"levels must be a positive integer, but got {levels}")
    if min_val >= max_val:
        raise ValueError(f"min_val ({min_val}) must be smaller than max_val ({max_val})")
    arr = np.clip(arr, min_val, max_val) - min_val
    return np.minimum(
        np.floor(levels * arr / (max_val - min_val)).astype(dtype), levels - 1)


def dequantize(arr, min_val, max_val, levels, dtype=np.float64):
    """Inverse of :func:`quantize` onto bucket centers (flow_util.py:151-170)."""
    if not (isinstance(levels, int) and levels > 1):
        raise ValueError(f"levels must be a positive integer, but got {levels}")
    if min_val >= max_val:
        raise ValueError(f"min_val ({min_val}) must be smaller than max_val ({max_val})")
    return (arr + 0.5).astype(dtype) * (max_val - min_val) / levels + min_val


def quantize_flow(flow, max_val=0.02, norm=True):
    """Flow -> two uint8 maps; 255 levels so 0 stays 0 after dequantization
    (flow_util.py:76-100)."""
    h, w, _ = flow.shape
    dx, dy = flow[..., 0], flow[..., 1]
    if norm:
        dx = dx / w
        dy = dy / h
    return tuple(quantize(d, -max_val, max_val, 255, np.uint8) for d in (dx, dy))


def dequantize_flow(dx, dy, max_val=0.02, denorm=True):
    """Recover flow from quantized dx/dy maps (flow_util.py:103-124)."""
    assert dx.shape == dy.shape
    assert dx.ndim == 2 or (dx.ndim == 3 and dx.shape[-1] == 1)
    dx, dy = (dequantize(d, -max_val, max_val, 255) for d in (dx, dy))
    if denorm:
        dx *= dx.shape[1]
        dy *= dx.shape[0]
    return np.dstack((dx, dy))


def flowread(flow_path, quantize=False, concat_axis=0, *args, **kwargs):
    """Read a .flo file (or quantized uint8 image pair) -> (H, W, 2) flow."""
    if quantize:
        import cv2

        assert concat_axis in (0, 1)
        cat_flow = cv2.imread(str(flow_path), cv2.IMREAD_UNCHANGED)
        if cat_flow.ndim != 2:
            raise IOError(
                f"{flow_path} is not a valid quantized flow file, "
                f"its dimension is {cat_flow.ndim}.")
        assert cat_flow.shape[concat_axis] % 2 == 0
        dx, dy = np.split(cat_flow, 2, axis=concat_axis)
        return dequantize_flow(dx, dy, *args, **kwargs).astype(np.float32)
    with open(flow_path, "rb") as f:
        header = f.read(4)
        if header != b"PIEH":
            raise IOError(f"Invalid flow file: {flow_path} (header {header!r})")
        w = np.fromfile(f, np.int32, 1).item()
        h = np.fromfile(f, np.int32, 1).item()
        flow = np.fromfile(f, np.float32, w * h * 2).reshape(h, w, 2)
    return flow


def flowwrite(flow, filename, quantize=False, concat_axis=0, *args, **kwargs):
    """Write (H, W, 2) flow -> .flo file, or a quantized uint8 image."""
    if quantize:
        import cv2

        assert concat_axis in (0, 1)
        dx, dy = quantize_flow(flow, *args, **kwargs)
        dxdy = np.concatenate((dx, dy), axis=concat_axis)
        if os.path.dirname(str(filename)):
            os.makedirs(os.path.dirname(str(filename)), exist_ok=True)
        cv2.imwrite(str(filename), dxdy)
        return
    with open(filename, "wb") as f:
        f.write(b"PIEH")
        h, w = flow.shape[:2]
        np.array([w, h], np.int32).tofile(f)
        flow.astype(np.float32).tofile(f)
