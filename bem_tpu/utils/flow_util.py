"""Optical-flow file IO (reference: basicsr/utils/flow_util.py, 170 LoC)."""

from __future__ import annotations

import numpy as np


def flowread(flow_path, quantize=False, concat_axis=0):
    """Read a .flo file -> (H, W, 2) float32 flow."""
    if quantize:
        raise NotImplementedError("quantized flow reading not wired")
    with open(flow_path, "rb") as f:
        header = f.read(4)
        if header != b"PIEH":
            raise IOError(f"Invalid flow file: {flow_path} (header {header!r})")
        w = np.fromfile(f, np.int32, 1).item()
        h = np.fromfile(f, np.int32, 1).item()
        flow = np.fromfile(f, np.float32, w * h * 2).reshape(h, w, 2)
    return flow


def flowwrite(flow, filename, quantize=False, concat_axis=0):
    """Write (H, W, 2) flow -> .flo file."""
    if quantize:
        raise NotImplementedError("quantized flow writing not wired")
    with open(filename, "wb") as f:
        f.write(b"PIEH")
        h, w = flow.shape[:2]
        np.array([w, h], np.int32).tofile(f)
        flow.astype(np.float32).tofile(f)


def quantize_flow(flow, max_val=0.02, norm=True):
    """Flow -> two uint8 maps (reference quantize_flow)."""
    h, w, _ = flow.shape
    dx, dy = flow[..., 0], flow[..., 1]
    if norm:
        dx = dx / w
        dy = dy / h
    def q(arr):
        arr = np.clip(arr, -max_val, max_val)
        return ((arr + max_val) / (2 * max_val) * 255.0).astype(np.uint8)
    return q(dx), q(dy)


def dequantize_flow(dx, dy, max_val=0.02, denorm=True):
    dx = dx.astype(np.float32) / 255.0 * 2 * max_val - max_val
    dy = dy.astype(np.float32) / 255.0 * 2 * max_val - max_val
    if denorm:
        dx *= dx.shape[1]
        dy *= dy.shape[0]
    return np.dstack([dx, dy])
