"""On-device (jnp) NIQE for in-graph candidate scoring.

Same algorithm as :mod:`bem_tpu.metrics.niqe` (the numpy golden port of
basicsr/metrics/niqe.py) but expressed in jnp so the K-sample Bayesian
selection loop (Enhancement/eval.py:244-253 scores candidates with NIQE on
the host) runs as ONE compiled TPU program: CG -> IE -> NIQE -> argmin with
no host round-trips.

Everything shape-dependent (MATLAB-imresize contribution weights, block
partitions) is precomputed with numpy at trace time; the traced graph is
static-shape jnp: two 7x7 convolutions per scale, a vectorized AGGD fit
(argmin over the 9801-entry gamma-ratio table + gammaln ratios), and a
36x36 Mahalanobis solve.

Numerics: fp32 on device vs the numpy port's fp64. The AGGD alpha lookup
is a hard argmin, so tiny fp differences can flip a table index by one
step (1e-3 in alpha); validated to ~1e-2 absolute in the final score
(tests/test_niqe_jax.py), far below the ~0.5+ NIQE differences that
candidate selection discriminates.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from .niqe import _GAM, _R_GAM

_PARAMS = None


def _pris_params():
    global _PARAMS
    if _PARAMS is None:
        p = np.load(os.path.join(os.path.dirname(__file__), "niqe_pris_params.npz"))
        _PARAMS = (
            np.squeeze(p["mu_pris_param"]).astype(np.float32),
            p["cov_pris_param"].astype(np.float32),
            p["gaussian_window"].astype(np.float32),
        )
    return _PARAMS


def _resize_half_mats(h: int, w: int):
    """MATLAB imresize(scale=0.5, antialiasing) as two dense row/col
    contribution matrices (numpy, static)."""
    from ..utils.matlab_functions import _contributions

    wh, ih = _contributions(h, int(np.ceil(h * 0.5)), 0.5, True)
    ww, iw = _contributions(w, int(np.ceil(w * 0.5)), 0.5, True)
    Mh = np.zeros((wh.shape[0], h), np.float32)
    np.add.at(Mh, (np.arange(wh.shape[0])[:, None], ih), wh)
    Mw = np.zeros((ww.shape[0], w), np.float32)
    np.add.at(Mw, (np.arange(ww.shape[0])[:, None], iw), ww)
    return Mh, Mw


def _aggd_params_jnp(flat):
    """Vectorized AGGD fit in jnp. flat: (N, P) ->
    (alpha, beta_l, beta_r, valid) with ``valid`` False for degenerate
    blocks (no negative or no positive samples) — the numpy/reference path
    yields NaN there (0/0 in nanmean) and drops the block row."""
    import jax
    import jax.numpy as jnp

    neg_mask = flat < 0
    pos_mask = flat > 0
    sq = flat * flat
    n_neg = jnp.sum(neg_mask, axis=1)
    n_pos = jnp.sum(pos_mask, axis=1)
    valid = (n_neg > 0) & (n_pos > 0)
    left_std = jnp.sqrt(jnp.sum(jnp.where(neg_mask, sq, 0.0), axis=1)
                        / jnp.maximum(n_neg, 1))
    right_std = jnp.sqrt(jnp.sum(jnp.where(pos_mask, sq, 0.0), axis=1)
                         / jnp.maximum(n_pos, 1))
    gammahat = left_std / jnp.maximum(right_std, 1e-20)
    rhat = jnp.mean(jnp.abs(flat), axis=1) ** 2 / jnp.maximum(
        jnp.mean(sq, axis=1), 1e-20)
    rhatnorm = (rhat * (gammahat**3 + 1) * (gammahat + 1)) / (
        (gammahat**2 + 1) ** 2
    )
    r_gam = jnp.asarray(_R_GAM, jnp.float32)
    gam = jnp.asarray(_GAM, jnp.float32)
    idx = jnp.argmin((r_gam[None, :] - rhatnorm[:, None]) ** 2, axis=1)
    alpha = gam[idx]
    lg = jax.scipy.special.gammaln
    ratio = jnp.exp(0.5 * (lg(1.0 / alpha) - lg(3.0 / alpha)))
    return alpha, left_std * ratio, right_std * ratio, valid


def _block_features_jnp(blocks):
    """blocks: (N, bh, bw) -> (N, 18) AGGD features (niqe.py:52-64)."""
    import jax
    import jax.numpy as jnp

    N = blocks.shape[0]
    lg = jax.scipy.special.gammaln
    feats = []
    alpha, bl, br, valid = _aggd_params_jnp(blocks.reshape(N, -1))
    feats += [alpha, (bl + br) / 2]
    for shift in ((0, 1), (1, 0), (1, 1), (1, -1)):
        shifted = jnp.roll(blocks, shift, axis=(1, 2))
        a2, bl2, br2, v2 = _aggd_params_jnp((blocks * shifted).reshape(N, -1))
        mean = (br2 - bl2) * jnp.exp(lg(2.0 / a2) - lg(1.0 / a2))
        feats += [a2, mean, bl2, br2]
        valid = valid & v2
    return jnp.stack(feats, axis=1), valid


def _mscn(img, window):
    """MSCN normalization: (img - mu) / (sigma + 1) with edge-replicate
    7x7 gaussian filtering (scipy convolve mode='nearest' equivalent)."""
    import jax
    import jax.numpy as jnp

    k = window.shape[0]
    p = k // 2
    x = jnp.pad(img, ((p, p), (p, p)), mode="edge")[None, :, :, None]
    # scipy.ndimage.convolve flips the kernel; the window is symmetric in
    # practice but flip anyway for exactness
    w = window[::-1, ::-1, None, None]

    def filt(a):
        return jax.lax.conv_general_dilated(
            a, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0, :, :, 0]

    mu = filt(x)
    sigma = jnp.sqrt(jnp.abs(filt(x * x) - mu * mu))
    return (img - mu) / (sigma + 1.0)


def niqe_fn(h: int, w: int, block: int = 96):
    """Build a jit-able ``(img2d_float[0..255]) -> score`` for a fixed HxW.

    Mirrors niqe_core (niqe.py:67-96): crop to block multiples, 2 scales of
    MSCN + per-block AGGD features in the reference's column-major block
    order, Mahalanobis distance to the pristine model.
    """
    import jax.numpy as jnp

    mu_pris, cov_pris, window = _pris_params()
    nbh, nbw = h // block, w // block
    hc, wc = nbh * block, nbw * block
    Mh, Mw = _resize_half_mats(hc, wc)
    mu_pris = jnp.asarray(mu_pris)
    cov_pris = jnp.asarray(cov_pris)
    win = jnp.asarray(window)
    Mhj = jnp.asarray(Mh)
    Mwj = jnp.asarray(Mw)

    def fn(img):
        img = img[:hc, :wc].astype(jnp.float32)
        feats, valids = [], []
        for scale in (1, 2):
            normalized = _mscn(img, win)
            bh, bw = block // scale, block // scale
            blocks = normalized.reshape(nbh, bh, nbw, bw).transpose(2, 0, 1, 3)
            blocks = blocks.reshape(nbw * nbh, bh, bw)
            f, v = _block_features_jnp(blocks)
            feats.append(f)
            valids.append(v)
            if scale == 1:
                img = (Mhj @ (img / 255.0) @ Mwj.T) * 255.0
        distparam = jnp.concatenate(feats, axis=1)  # (nblocks, 36)
        # the reference drops block rows whose AGGD fit produced NaN
        # (degenerate constant blocks) from BOTH mean and cov, but
        # nanmean keeps per-column values of partially-NaN rows; a
        # degenerate block NaNs all its columns at that scale, so a
        # per-scale column mask reproduces nanmean exactly
        w = jnp.concatenate(
            [jnp.repeat(valids[0][:, None], 18, 1),
             jnp.repeat(valids[1][:, None], 18, 1)], axis=1
        ).astype(jnp.float32)
        mu_dist = jnp.sum(distparam * w, axis=0) / jnp.maximum(
            jnp.sum(w, axis=0), 1.0)
        row_ok = (valids[0] & valids[1]).astype(jnp.float32)[:, None]
        n_good = jnp.maximum(jnp.sum(row_ok), 2.0)
        xc = (distparam - mu_dist) * row_ok
        cov_dist = (xc.T @ xc) / (n_good - 1.0)
        # np.cov centers on the good-row mean; correct the cross term
        mu_good = jnp.sum(distparam * row_ok, axis=0) / n_good
        dmu = (mu_good - mu_dist)[:, None]
        cov_dist = cov_dist - (n_good / (n_good - 1.0)) * (dmu @ dmu.T)
        diff = mu_pris - mu_dist
        # (cov_pris + cov_dist)/2 is PD in practice; LU solve tracks the
        # reference's fp64 pinv far better than fp32 SVD-pinv (which
        # truncates small singular values at fp32 rcond)
        sol = jnp.linalg.solve((cov_pris + cov_dist) / 2, diff)
        return jnp.sqrt(jnp.maximum(diff @ sol, 0.0))

    return fn


def rgb_to_y_255(rgb, round_rgb: bool = True):
    """[0,1] RGB float -> BT.601 Y in [16,235], rounded (to_y_channel +
    calculate_niqe's final round, metrics/metric_util.py / niqe.py:119).

    ``round_rgb=True`` additionally rounds the [0,255] RGB first, matching
    the uint8 tensor2img protocol; the eval CLI's candidate scoring feeds
    unrounded floats (Enhancement/eval.py NIQE branch), so it uses False.
    """
    import jax.numpy as jnp

    x = jnp.clip(rgb.astype(jnp.float32), 0.0, 1.0) * 255.0
    if round_rgb:
        x = jnp.round(x)
    y = (x[..., 0] * 65.481 + x[..., 1] * 128.553 + x[..., 2] * 24.966) / 255.0 + 16.0
    return jnp.round(y)


def niqe_batch_rgb(h: int, w: int, block: int = 96, round_rgb: bool = True):
    """(K, H, W, 3) [0,1] RGB candidates -> (K,) NIQE scores, on device."""
    import jax

    core = niqe_fn(h, w, block)

    def fn(imgs):
        return jax.vmap(lambda im: core(rgb_to_y_255(im, round_rgb)))(imgs)

    return fn
