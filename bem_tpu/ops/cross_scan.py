"""Cross-scan / cross-merge: the four directional flattenings of a 2D image.

TPU-native replacement for the reference Triton kernel
``triton_cross_scan_flex`` (basicsr/vmamba/models/csm_triton.py:278-391) and
its torch fallbacks (csm_triton.py:22-86). On TPU these are pure data
movement (transpose / flip / stack) that XLA fuses into neighbouring ops, so
no custom kernel is warranted.

Layout is channels-last: images are (B, H, W, C); sequences are (B, K, L, C)
with L = H*W. Directions (scans=0, "cross2d" — the mode every BEM config
uses, vmamba.py:574):
  k=0 row-major, k=1 column-major, k=2 reversed row-major, k=3 reversed
  column-major.
scans=1 ("unidi") repeats the row-major scan 4×; scans=2 ("bidi") is
row-major + its reverse duplicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_scan(x: jax.Array, scans: int = 0) -> jax.Array:
    """(B, H, W, C) -> (B, 4, L, C) directional sequences."""
    B, H, W, C = x.shape
    L = H * W
    row = x.reshape(B, L, C)
    if scans == 0:
        col = jnp.transpose(x, (0, 2, 1, 3)).reshape(B, L, C)
        return jnp.stack(
            [row, col, jnp.flip(row, axis=1), jnp.flip(col, axis=1)], axis=1
        )
    if scans == 1:
        return jnp.broadcast_to(row[:, None], (B, 4, L, C))
    if scans == 2:
        rev = jnp.flip(row, axis=1)
        return jnp.stack([row, row, rev, rev], axis=1)
    raise ValueError(f"unsupported scans mode: {scans}")


def cross_scan_cf(x: jax.Array, scans: int = 0) -> jax.Array:
    """(B, H, W, C) -> (B, 4, C, L) channel-first sequences.

    L-minor layout for the fused TPU scan kernel: the lane dimension carries
    the sequence, so narrow channel counts (e.g. n_feat=40) don't get padded
    to 128 lanes in HBM.
    """
    B, H, W, C = x.shape
    L = H * W
    xc = jnp.transpose(x, (0, 3, 1, 2))  # (B, C, H, W)
    row = xc.reshape(B, C, L)
    if scans == 0:
        col = jnp.transpose(xc, (0, 1, 3, 2)).reshape(B, C, L)
        return jnp.stack(
            [row, col, jnp.flip(row, axis=-1), jnp.flip(col, axis=-1)], axis=1
        )
    if scans == 1:
        return jnp.broadcast_to(row[:, None], (B, 4, C, L))
    if scans == 2:
        rev = jnp.flip(row, axis=-1)
        return jnp.stack([row, row, rev, rev], axis=1)
    raise ValueError(f"unsupported scans mode: {scans}")


def cross_scan_cf_input(x_cf: jax.Array, scans: int = 0) -> jax.Array:
    """(B, C, H, W) channel-first input -> (B, 4, C, L) — no entry transpose."""
    B, C, H, W = x_cf.shape
    L = H * W
    row = x_cf.reshape(B, C, L)
    if scans == 0:
        col = jnp.transpose(x_cf, (0, 1, 3, 2)).reshape(B, C, L)
        return jnp.stack(
            [row, col, jnp.flip(row, axis=-1), jnp.flip(col, axis=-1)], axis=1
        )
    if scans == 1:
        return jnp.broadcast_to(row[:, None], (B, 4, C, L))
    if scans == 2:
        rev = jnp.flip(row, axis=-1)
        return jnp.stack([row, row, rev, rev], axis=1)
    raise ValueError(f"unsupported scans mode: {scans}")


def cross_merge_cf_output(y: jax.Array, H: int, W: int, scans: int = 0) -> jax.Array:
    """(B, 4, C, L) -> (B, C, H, W) summed, staying channel-first."""
    B, K, C, L = y.shape
    assert K == 4 and L == H * W
    if scans == 0:
        fwd = y[:, 0] + jnp.flip(y[:, 2], axis=-1)
        colv = y[:, 1] + jnp.flip(y[:, 3], axis=-1)
        col = jnp.transpose(colv.reshape(B, C, W, H), (0, 1, 3, 2)).reshape(B, C, L)
        out = fwd + col
    elif scans == 1:
        out = jnp.sum(y, axis=1)
    elif scans == 2:
        out = y[:, 0] + y[:, 1] + jnp.flip(y[:, 2] + y[:, 3], axis=-1)
    else:
        raise ValueError(f"unsupported scans mode: {scans}")
    return out.reshape(B, C, H, W)


def cross_merge_cf(y: jax.Array, H: int, W: int, scans: int = 0) -> jax.Array:
    """(B, 4, C, L) channel-first outputs -> (B, H, W, C) summed."""
    B, K, C, L = y.shape
    assert K == 4 and L == H * W
    if scans == 0:
        fwd = y[:, 0] + jnp.flip(y[:, 2], axis=-1)
        colv = y[:, 1] + jnp.flip(y[:, 3], axis=-1)
        col = jnp.transpose(colv.reshape(B, C, W, H), (0, 1, 3, 2)).reshape(B, C, L)
        out = fwd + col
    elif scans == 1:
        out = jnp.sum(y, axis=1)
    elif scans == 2:
        out = y[:, 0] + y[:, 1] + jnp.flip(y[:, 2] + y[:, 3], axis=-1)
    else:
        raise ValueError(f"unsupported scans mode: {scans}")
    return jnp.transpose(out.reshape(B, C, H, W), (0, 2, 3, 1))


def cross_merge(y: jax.Array, H: int, W: int, scans: int = 0) -> jax.Array:
    """(B, 4, L, C) directional outputs -> (B, H, W, C) summed.

    Inverse-then-sum of :func:`cross_scan` (reference cross_merge_fwd,
    csm_triton.py:56-86).
    """
    B, K, L, C = y.shape
    assert K == 4 and L == H * W
    if scans == 0:
        fwd = y[:, 0] + jnp.flip(y[:, 2], axis=1)
        colv = y[:, 1] + jnp.flip(y[:, 3], axis=1)
        col = jnp.transpose(colv.reshape(B, W, H, C), (0, 2, 1, 3)).reshape(B, L, C)
        out = fwd + col
    elif scans == 1:
        out = jnp.sum(y, axis=1)
    elif scans == 2:
        out = y[:, 0] + y[:, 1] + jnp.flip(y[:, 2] + y[:, 3], axis=1)
    else:
        raise ValueError(f"unsupported scans mode: {scans}")
    return out.reshape(B, H, W, C)
