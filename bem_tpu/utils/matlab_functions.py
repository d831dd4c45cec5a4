"""MATLAB-compatible cubic imresize (reference: basicsr/utils/matlab_functions.py).

Pure numpy implementation of the MATLAB imresize algorithm (cubic kernel
with a=-0.5, antialiased by widening the kernel when downscaling, per-row
weight normalization, edge-clamped indices). Needed because NIQE's second
scale depends on MATLAB-exact resampling (niqe.py:123).
"""

from __future__ import annotations

import numpy as np


def _cubic(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    ax2, ax3 = ax**2, ax**3
    return (1.5 * ax3 - 2.5 * ax2 + 1) * (ax <= 1) + (
        -0.5 * ax3 + 2.5 * ax2 - 4 * ax + 2
    ) * ((ax > 1) & (ax <= 2))


def _contributions(in_length: int, out_length: int, scale: float, antialiasing: bool):
    kernel_width = 4.0
    if scale < 1 and antialiasing:
        kernel_width = kernel_width / scale

    x = np.arange(1, out_length + 1, dtype=np.float64)
    # input-space center of each output pixel (MATLAB convention)
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    p = int(np.ceil(kernel_width)) + 2
    indices = left[:, None] + np.arange(p)[None, :] - 1  # 0-based candidates

    dist = u[:, None] - (indices + 1)
    if scale < 1 and antialiasing:
        weights = scale * _cubic(dist * scale)
    else:
        weights = _cubic(dist)
    weights = weights / np.sum(weights, axis=1, keepdims=True)

    # trim zero columns
    nz = np.nonzero(np.any(weights != 0, axis=0))[0]
    weights = weights[:, nz[0] : nz[-1] + 1]
    indices = indices[:, nz[0] : nz[-1] + 1]
    # MATLAB maps out-of-range indices through symmetric (mirror) padding
    aux = np.concatenate([np.arange(in_length), np.arange(in_length - 1, -1, -1)])
    indices = aux[np.mod(indices.astype(np.int64), 2 * in_length)]
    return weights, indices


def imresize(img: np.ndarray, scale: float = None, out_shape=None,
             antialiasing: bool = True) -> np.ndarray:
    """MATLAB imresize with the 'bicubic' kernel. img: (H, W) or (H, W, C),
    float (any range) or uint8; returns float64 in the input range."""
    img = np.asarray(img, np.float64)
    squeeze2d = img.ndim == 2
    if squeeze2d:
        img = img[:, :, None]
    in_h, in_w, c = img.shape
    if out_shape is not None:
        out_h, out_w = out_shape
        scale_h, scale_w = out_h / in_h, out_w / in_w
    else:
        scale_h = scale_w = scale
        out_h, out_w = int(np.ceil(in_h * scale_h)), int(np.ceil(in_w * scale_w))

    wh, ih = _contributions(in_h, out_h, scale_h, antialiasing)
    ww, iw = _contributions(in_w, out_w, scale_w, antialiasing)

    # resize along H: out_row[o] = sum_k wh[o,k] * img[ih[o,k]]
    tmp = np.einsum("ok,okwc->owc", wh, img[ih])
    # resize along W: tmp[:, iw] has shape (out_h, out_w, k, c)
    out = np.einsum("ok,hokc->hoc", ww, tmp[:, iw])
    if squeeze2d:
        out = out[:, :, 0]
    return out
