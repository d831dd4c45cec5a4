"""ctypes bindings for the native host-pipeline library.

Auto-builds with g++ on first import if the shared object is missing (no
pip/pybind11 dependency); every entry point has a numpy fallback, so the
framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libbem_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-pthread",
                 os.path.join(_DIR, "histogram.cpp"), "-o", _SO],
                check=True, capture_output=True,
            )
        except Exception:
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_SO)
        lib.kde_histograms.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.paired_crop_augment.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    except OSError:
        _lib = False
    return _lib


def available() -> bool:
    return bool(_load())


def kde_histograms(image: np.ndarray, patch: int, bins: int,
                   n_threads: int = 2) -> np.ndarray:
    """(H, W, 3) float32 [0,1] -> (3, nH, nW, bins); native or None."""
    lib = _load()
    if not lib:
        return None
    image = np.ascontiguousarray(image, np.float32)
    H, W, _ = image.shape
    nH = -(-H // patch)
    nW = -(-W // patch)
    out = np.empty((3, nH, nW, bins), np.float32)
    lib.kde_histograms(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), H, W, patch,
        bins, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max(1, n_threads),
    )
    return out


def paired_crop_augment(lq: np.ndarray, gt: np.ndarray, top: int, left: int,
                        patch: int, mode: int):
    """Fused crop + geometric-augment; returns (gt_out, lq_out) or None."""
    lib = _load()
    if not lib:
        return None
    lq = np.ascontiguousarray(lq, np.float32)
    gt = np.ascontiguousarray(gt, np.float32)
    H, W, _ = lq.shape
    out_lq = np.empty((patch, patch, 3), np.float32)
    out_gt = np.empty((patch, patch, 3), np.float32)
    lib.paired_crop_augment(
        lq.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        gt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        H, W, top, left, patch, mode,
        out_lq.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_gt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out_gt, out_lq
