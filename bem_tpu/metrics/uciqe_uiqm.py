"""Underwater no-reference metrics UCIQE and UIQM.

Re-implementations of the published metrics, numerically matching the
reference (basicsr/metrics/uciqe_uiqm.py:42-79 getUCIQE, :302-553 getUIQM):
- UCIQE = 0.4680*sigma_chroma + 0.2745*contrast_lum + 0.2576*mean_sat
  on Lab (cv2 RGB2LAB / 255 variant).
- UIQM = 0.0282*UICM + 0.2953*UISM + 3.5753*UIConM with alpha-trimmed
  colorfulness stats, Sobel-edge EME sharpness, and blockwise logAMEE
  contrast. Block loops are vectorized.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage

from ..utils.registry import METRIC_REGISTRY


def getUCIQE(img_RGB: np.ndarray) -> float:
    """(H, W, 3) RGB uint8/[0,255] -> UCIQE (uciqe_uiqm.py:42-79)."""
    import cv2

    if img_RGB.dtype != np.uint8:
        img_RGB = img_RGB.astype(np.uint8)
    lab = cv2.cvtColor(img_RGB, cv2.COLOR_RGB2LAB)
    coe = [0.4680, 0.2745, 0.2576]
    lum = lab[..., 0] / 255.0
    a = lab[..., 1] / 255.0
    b = lab[..., 2] / 255.0
    chroma = np.sqrt(a**2 + b**2)
    sat = chroma / np.sqrt(chroma**2 + lum**2 + 1e-12)
    aver_sat = float(np.mean(sat))
    aver_chr = float(np.mean(chroma))
    with np.errstate(divide="ignore", invalid="ignore"):
        var_chr = float(np.sqrt(np.nanmean(np.abs(1 - (aver_chr / chroma) ** 2))))
    # luminance contrast via 1%/99% cdf points (nbins=65536 since lum is float)
    nbins = 65536
    hist, _ = np.histogram(lum, nbins)
    cdf = np.cumsum(hist) / np.sum(hist)
    ilow = int(np.argmax(cdf > 0.0100))
    ihigh = int(np.argmax(cdf >= 0.9900))
    con_lum = (ihigh - 1) / (nbins - 1) - (ilow - 1) / (nbins - 1)
    return coe[0] * var_chr + coe[1] * con_lum + coe[2] * aver_sat


# ---------------------------------------------------------------------- UIQM


def _alpha_trimmed_mean(x: np.ndarray, alpha_l=0.1, alpha_r=0.1) -> float:
    x = np.sort(x)
    K = len(x)
    t_l = int(np.ceil(alpha_l * K))
    t_r = int(np.floor(alpha_r * K))
    # reference sums x[T_a_L+1 : K-T_a_R] (mu_a, uciqe_uiqm.py:302-320)
    return float(np.sum(x[t_l + 1 : K - t_r]) / (K - t_l - t_r))


def _uicm(x: np.ndarray) -> float:
    R, G, B = x[..., 0].ravel(), x[..., 1].ravel(), x[..., 2].ravel()
    rg = R - G
    yb = (R + G) / 2 - B
    mu_rg = _alpha_trimmed_mean(rg)
    mu_yb = _alpha_trimmed_mean(yb)
    s_rg = float(np.mean((rg - mu_rg) ** 2))
    s_yb = float(np.mean((yb - mu_yb) ** 2))
    return -0.0268 * np.sqrt(mu_rg**2 + mu_yb**2) + 0.1586 * np.sqrt(s_rg + s_yb)


def _sobel_mag(x: np.ndarray) -> np.ndarray:
    dx = ndimage.sobel(x, 0)
    dy = ndimage.sobel(x, 1)
    mag = np.hypot(dx, dy)
    m = np.max(mag)
    if m > 0:
        mag = mag * (255.0 / m)
    return mag


def _eme(ch: np.ndarray, blocksize: int = 10) -> float:
    """Blockwise log(max/min), remainder absorbed into the last block
    (uciqe_uiqm.py:377-400)."""
    nx = ch.shape[0] // blocksize
    ny = ch.shape[1] // blocksize
    if nx == 0 or ny == 0:
        return 0.0
    w = 2.0 / (nx * ny)
    total = 0.0
    for i in range(nx):
        xr = (i + 1) * blocksize if i < nx - 1 else ch.shape[0]
        for j in range(ny):
            yr = (j + 1) * blocksize if j < ny - 1 else ch.shape[1]
            block = ch[i * blocksize : xr, j * blocksize : yr]
            bmin, bmax = block.min(), block.max()
            if bmin != 0 and bmax != 0:
                total += w * np.log(bmax / bmin)
    return float(total)


def _uism(x: np.ndarray) -> float:
    lambdas = (0.299, 0.587, 0.144)  # reference's coefficients (incl. 0.144 typo)
    total = 0.0
    for c, lam in enumerate(lambdas):
        ch = x[..., c]
        edge_map = _sobel_mag(ch) * ch
        total += lam * _eme(edge_map)
    return float(total)


def _uiconm(x: np.ndarray, window_size: int = 10) -> float:
    """Blockwise logAMEE contrast (uciqe_uiqm.py:488-523), vectorized."""
    k1 = x.shape[1] // window_size
    k2 = x.shape[0] // window_size
    if k1 == 0 or k2 == 0:
        return 0.0
    x = x[: k2 * window_size, : k1 * window_size, :]
    blocks = x.reshape(k2, window_size, k1, window_size, -1)
    bmax = blocks.max(axis=(1, 3, 4))
    bmin = blocks.min(axis=(1, 3, 4))
    top = bmax - bmin
    bot = bmax + bmin
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where((bot != 0) & (top != 0), top / np.where(bot == 0, 1, bot), 0)
        term = np.where(ratio > 0, ratio * np.log(np.where(ratio > 0, ratio, 1)), 0.0)
    w = -1.0 / (k1 * k2)
    return float(w * np.sum(term))


def getUIQM(img_RGB: np.ndarray) -> float:
    """(H, W, 3) RGB uint8/[0,255] -> UIQM (uciqe_uiqm.py:525-539)."""
    if img_RGB.dtype != np.uint8:
        img_RGB = img_RGB.astype(np.uint8)
    x = np.asarray(img_RGB, np.float32)
    c1, c2, c3 = 0.0282, 0.2953, 3.5753
    return c1 * _uicm(x) + c2 * _uism(x) + c3 * _uiconm(x, 10)


@METRIC_REGISTRY.register()
def calculate_uciqe(img, crop_border=0, input_order="HWC", **kwargs):
    """img: [0,255] BGR (framework metric convention) -> UCIQE."""
    img = np.asarray(img)
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border]
    return getUCIQE(img[..., ::-1])


@METRIC_REGISTRY.register()
def calculate_uiqm(img, crop_border=0, input_order="HWC", **kwargs):
    img = np.asarray(img)
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border]
    return getUIQM(img[..., ::-1])
