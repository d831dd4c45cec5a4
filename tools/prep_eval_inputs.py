"""Prepare deterministic inputs for the TPU eval-queue runs.

The measurement queue (tools/run_tpu_queue.sh items 4/4b) drives the real
two-stage eval CLI (reference surface: Enhancement/eval.py:199-264) against
/tmp/eval_in + /tmp/eval_gt.  LOLv1 data is absent from this environment
(zero egress), so this script synthesizes a small deterministic stand-in:
LOLv1-shaped 400x600 RGB pairs where the "low" image is a gamma-darkened,
noise-corrupted copy of the "GT" — enough structure that candidate scoring
(NIQE argmin over K samples) is exercised on non-degenerate statistics.

Also builds the seeded CLIP-IQA bundle (/tmp/clip_iqa_seeded.npz) via
tools/convert_clip.py --seeded so queue item 4 (--no_ref clip, the
driver-config-#4 path) can run without egress.

Run on the build host before tools/run_tpu_queue.sh:
    python tools/prep_eval_inputs.py
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np


def make_pairs(in_dir: str, gt_dir: str, n: int = 3, h: int = 400, w: int = 600):
    import cv2

    os.makedirs(in_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    rng = np.random.default_rng(287128)
    for i in range(n):
        # piecewise-smooth GT: random low-frequency field + edges
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.zeros((h, w, 3), np.float32)
        for c in range(3):
            f = rng.uniform(1.0, 3.0, 4)
            p = rng.uniform(0, 2 * np.pi, 4)
            img[..., c] = (
                0.55
                + 0.25 * np.sin(2 * np.pi * f[0] * xx / w + p[0])
                * np.cos(2 * np.pi * f[1] * yy / h + p[1])
                + 0.15 * np.sin(2 * np.pi * f[2] * (xx + yy) / (h + w) + p[2])
            )
        # blocky "objects" so NIQE's local stats see real edges
        for _ in range(6):
            y0, x0 = rng.integers(0, h - 80), rng.integers(0, w - 80)
            bh, bw = rng.integers(30, 80), rng.integers(30, 80)
            img[y0:y0 + bh, x0:x0 + bw] *= rng.uniform(0.4, 1.5)
        gt = np.clip(img, 0, 1)
        low = np.clip(gt ** rng.uniform(2.2, 3.0) * rng.uniform(0.25, 0.45)
                      + rng.normal(0, 0.01, gt.shape).astype(np.float32), 0, 1)
        name = f"{i + 1:03d}.png"
        cv2.imwrite(os.path.join(gt_dir, name),
                    (gt[..., ::-1] * 255).round().astype(np.uint8))
        cv2.imwrite(os.path.join(in_dir, name),
                    (low[..., ::-1] * 255).round().astype(np.uint8))
    print(f"wrote {n} pairs to {in_dir} / {gt_dir}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    make_pairs("/tmp/eval_in", "/tmp/eval_gt", n=n)
    if not os.path.exists("/tmp/clip_iqa_seeded.npz"):
        subprocess.run(
            [sys.executable, "tools/convert_clip.py", "--seeded", "0",
             "--out", "/tmp/clip_iqa_seeded.npz"],
            check=True,
        )
    print("eval inputs ready")


if __name__ == "__main__":
    main()
