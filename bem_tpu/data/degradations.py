"""Degradation synthesis (reference: basicsr/data/degradations.py, 764 LoC).

Blur-kernel generators (iso/aniso Gaussian, generalized Gaussian, plateau,
sinc), mixed-kernel sampling, Gaussian/Poisson noise (color + gray), and JPEG
compression — the Real-ESRGAN-style degradation pipeline. Host-side numpy
(these run in the data loader).
"""

from __future__ import annotations

import math
import random
from typing import Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


# --------------------------------------------------------------- blur kernels


def _mesh_grid(kernel_size: int):
    ax = np.arange(-kernel_size // 2 + 1.0, kernel_size // 2 + 1.0)
    xx, yy = np.meshgrid(ax, ax)
    xy = np.hstack([xx.reshape(-1, 1), yy.reshape(-1, 1)]).reshape(
        kernel_size, kernel_size, 2
    )
    return xy, xx, yy


def _sigma_matrix2(sig_x, sig_y, theta):
    d = np.array([[sig_x**2, 0], [0, sig_y**2]])
    u = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    return u @ d @ u.T


def bivariate_gaussian(kernel_size, sig_x, sig_y=None, theta=0.0, grid=None,
                       isotropic=True):
    if grid is None:
        grid, _, _ = _mesh_grid(kernel_size)
    if isotropic:
        sigma_matrix = np.array([[sig_x**2, 0], [0, sig_x**2]])
    else:
        sigma_matrix = _sigma_matrix2(sig_x, sig_y, theta)
    inverse_sigma = np.linalg.inv(sigma_matrix)
    kernel = np.exp(-0.5 * np.sum(grid @ inverse_sigma * grid, 2))
    return kernel / np.sum(kernel)


def bivariate_generalized_gaussian(kernel_size, sig_x, sig_y, theta, beta,
                                   grid=None, isotropic=True):
    if grid is None:
        grid, _, _ = _mesh_grid(kernel_size)
    if isotropic:
        sigma_matrix = np.array([[sig_x**2, 0], [0, sig_x**2]])
    else:
        sigma_matrix = _sigma_matrix2(sig_x, sig_y, theta)
    inverse_sigma = np.linalg.inv(sigma_matrix)
    kernel = np.exp(-0.5 * np.power(np.sum(grid @ inverse_sigma * grid, 2), beta))
    return kernel / np.sum(kernel)


def bivariate_plateau(kernel_size, sig_x, sig_y, theta, beta, grid=None,
                      isotropic=True):
    if grid is None:
        grid, _, _ = _mesh_grid(kernel_size)
    if isotropic:
        sigma_matrix = np.array([[sig_x**2, 0], [0, sig_x**2]])
    else:
        sigma_matrix = _sigma_matrix2(sig_x, sig_y, theta)
    inverse_sigma = np.linalg.inv(sigma_matrix)
    kernel = np.reciprocal(np.power(np.sum(grid @ inverse_sigma * grid, 2), beta) + 1)
    return kernel / np.sum(kernel)


def random_bivariate_gaussian(kernel_size, sigma_x_range, sigma_y_range=None,
                              rotation_range=(-math.pi, math.pi),
                              noise_range=None, isotropic=True):
    sigma_x = np.random.uniform(*sigma_x_range)
    if isotropic:
        sigma_y, rotation = sigma_x, 0.0
    else:
        sigma_y = np.random.uniform(*sigma_y_range)
        rotation = np.random.uniform(*rotation_range)
    kernel = bivariate_gaussian(kernel_size, sigma_x, sigma_y, rotation,
                                isotropic=isotropic)
    if noise_range is not None:
        kernel = kernel * np.random.uniform(*noise_range, kernel.shape)
    return kernel / np.sum(kernel)


def random_bivariate_generalized_gaussian(kernel_size, sigma_x_range,
                                          sigma_y_range, rotation_range,
                                          beta_range, noise_range=None,
                                          isotropic=True):
    sigma_x = np.random.uniform(*sigma_x_range)
    if isotropic:
        sigma_y, rotation = sigma_x, 0.0
    else:
        sigma_y = np.random.uniform(*sigma_y_range)
        rotation = np.random.uniform(*rotation_range)
    if np.random.uniform() < 0.5:
        beta = np.random.uniform(beta_range[0], 1)
    else:
        beta = np.random.uniform(1, beta_range[1])
    kernel = bivariate_generalized_gaussian(kernel_size, sigma_x, sigma_y,
                                            rotation, beta, isotropic=isotropic)
    if noise_range is not None:
        kernel = kernel * np.random.uniform(*noise_range, kernel.shape)
    return kernel / np.sum(kernel)


def random_bivariate_plateau(kernel_size, sigma_x_range, sigma_y_range,
                             rotation_range, beta_range, noise_range=None,
                             isotropic=True):
    sigma_x = np.random.uniform(*sigma_x_range)
    if isotropic:
        sigma_y, rotation = sigma_x, 0.0
    else:
        sigma_y = np.random.uniform(*sigma_y_range)
        rotation = np.random.uniform(*rotation_range)
    if np.random.uniform() < 0.5:
        beta = np.random.uniform(beta_range[0], 1)
    else:
        beta = np.random.uniform(1, beta_range[1])
    kernel = bivariate_plateau(kernel_size, sigma_x, sigma_y, rotation, beta,
                               isotropic=isotropic)
    if noise_range is not None:
        kernel = kernel * np.random.uniform(*noise_range, kernel.shape)
    return kernel / np.sum(kernel)


def random_mixed_kernels(kernel_list: Sequence[str], kernel_prob, kernel_size=21,
                         sigma_x_range=(0.6, 5), sigma_y_range=(0.6, 5),
                         rotation_range=(-math.pi, math.pi),
                         betag_range=(0.5, 8), betap_range=(0.5, 8),
                         noise_range=None):
    kernel_type = random.choices(kernel_list, kernel_prob)[0]
    if kernel_type == "iso":
        return random_bivariate_gaussian(kernel_size, sigma_x_range,
                                         noise_range=noise_range, isotropic=True)
    if kernel_type == "aniso":
        return random_bivariate_gaussian(kernel_size, sigma_x_range, sigma_y_range,
                                         rotation_range, noise_range, isotropic=False)
    if kernel_type == "generalized_iso":
        return random_bivariate_generalized_gaussian(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            betag_range, noise_range, isotropic=True)
    if kernel_type == "generalized_aniso":
        return random_bivariate_generalized_gaussian(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            betag_range, noise_range, isotropic=False)
    if kernel_type == "plateau_iso":
        return random_bivariate_plateau(kernel_size, sigma_x_range, sigma_y_range,
                                        rotation_range, betap_range, None, True)
    if kernel_type == "plateau_aniso":
        return random_bivariate_plateau(kernel_size, sigma_x_range, sigma_y_range,
                                        rotation_range, betap_range, None, False)
    raise ValueError(kernel_type)


def circular_lowpass_kernel(cutoff, kernel_size, pad_to=0):
    """2D sinc filter (degradations.py circular_lowpass_kernel)."""
    from scipy.special import j1

    assert kernel_size % 2 == 1
    kernel = np.fromfunction(
        lambda x, y: cutoff * j1(
            cutoff * np.sqrt((x - (kernel_size - 1) / 2) ** 2
                             + (y - (kernel_size - 1) / 2) ** 2) + 1e-12
        ) / (2 * np.pi * np.sqrt(
            (x - (kernel_size - 1) / 2) ** 2
            + (y - (kernel_size - 1) / 2) ** 2) + 1e-12),
        [kernel_size, kernel_size],
    )
    kernel[(kernel_size - 1) // 2, (kernel_size - 1) // 2] = cutoff**2 / (4 * np.pi)
    kernel = kernel / np.sum(kernel)
    if pad_to > kernel_size:
        pad = (pad_to - kernel_size) // 2
        kernel = np.pad(kernel, ((pad, pad), (pad, pad)))
    return kernel


# --------------------------------------------------------------------- noise


def generate_gaussian_noise(img, sigma=10, gray_noise=False):
    if gray_noise:
        noise = np.random.randn(*img.shape[:2]).astype(np.float32)[..., None]
        noise = np.repeat(noise, 3, axis=2) * sigma / 255.0
    else:
        noise = np.random.randn(*img.shape).astype(np.float32) * sigma / 255.0
    return noise


def add_gaussian_noise(img, sigma=10, clip=True, rounds=False, gray_noise=False):
    noise = generate_gaussian_noise(img, sigma, gray_noise)
    out = img + noise
    if clip and rounds:
        out = np.clip((out * 255.0).round(), 0, 255) / 255.0
    elif clip:
        out = np.clip(out, 0, 1)
    elif rounds:
        out = (out * 255.0).round() / 255.0
    return out


def random_add_gaussian_noise(img, sigma_range=(0, 10), gray_prob=0, clip=True,
                              rounds=False):
    sigma = np.random.uniform(*sigma_range)
    gray = np.random.uniform() < gray_prob
    return add_gaussian_noise(img, sigma, clip, rounds, gray)


def generate_poisson_noise(img, scale=1.0, gray_noise=False):
    if gray_noise and cv2 is not None:
        gimg = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    else:
        gimg = img
    vals = len(np.unique(gimg))
    vals = 2 ** np.ceil(np.log2(vals))
    out = np.float32(np.random.poisson(gimg * vals) / float(vals))
    noise = out - gimg
    if gray_noise and noise.ndim == 2:
        noise = np.repeat(noise[..., None], 3, axis=2)
    return noise * scale


def add_poisson_noise(img, scale=1.0, clip=True, rounds=False, gray_noise=False):
    noise = generate_poisson_noise(img, scale, gray_noise)
    out = img + noise
    if clip and rounds:
        out = np.clip((out * 255.0).round(), 0, 255) / 255.0
    elif clip:
        out = np.clip(out, 0, 1)
    elif rounds:
        out = (out * 255.0).round() / 255.0
    return out


def random_add_poisson_noise(img, scale_range=(0, 1.0), gray_prob=0, clip=True,
                             rounds=False):
    scale = np.random.uniform(*scale_range)
    gray = np.random.uniform() < gray_prob
    return add_poisson_noise(img, scale, clip, rounds, gray)


# ---------------------------------------------------------------------- JPEG


def add_jpg_compression(img, quality=90):
    """img: [0,1] BGR float -> JPEG roundtrip (degradations.py add_jpg_compression)."""
    img = np.clip(img, 0, 1)
    encode_param = [int(cv2.IMWRITE_JPEG_QUALITY), int(quality)]
    _, encimg = cv2.imencode(".jpg", (img * 255.0).astype(np.uint8), encode_param)
    return np.float32(cv2.imdecode(encimg, 1)) / 255.0


def random_add_jpg_compression(img, quality_range=(90, 100)):
    return add_jpg_compression(img, np.random.uniform(*quality_range))
