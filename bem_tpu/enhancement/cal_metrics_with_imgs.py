"""Compute PSNR/SSIM(/LPIPS) between two image directories
(reference: Enhancement/cal_metrics_with_imgs.py).

python -m bem_tpu.enhancement.cal_metrics_with_imgs --pred_dir ... --gt_dir ...
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(args_list=None):
    import cv2

    from ..metrics import calculate_psnr, calculate_ssim

    p = argparse.ArgumentParser()
    p.add_argument("--pred_dir", required=True)
    p.add_argument("--gt_dir", required=True)
    p.add_argument("--lpips", action="store_true")
    p.add_argument("--GT_mean", action="store_true")
    args = p.parse_args(args_list)

    exts = (".png", ".jpg", ".jpeg", ".bmp", ".tif")
    preds = sorted(f for f in os.listdir(args.pred_dir) if f.lower().endswith(exts))
    gts = sorted(f for f in os.listdir(args.gt_dir) if f.lower().endswith(exts))
    assert len(preds) == len(gts), f"{len(preds)} preds vs {len(gts)} gts"

    lpips_fn = None
    if args.lpips:
        from .lpips_jax import LPIPS

        lpips_fn = LPIPS()

    psnrs, ssims, lpipss = [], [], []
    for pf, gf in zip(preds, gts):
        pred = cv2.imread(os.path.join(args.pred_dir, pf)).astype(np.float32) / 255.0
        gt = cv2.imread(os.path.join(args.gt_dir, gf)).astype(np.float32) / 255.0
        if args.GT_mean:
            pred = np.clip(
                pred * (gt.mean((0, 1), keepdims=True)
                        / (pred.mean((0, 1), keepdims=True) + 1e-8)), 0, 1
            )
        psnrs.append(calculate_psnr(gt * 255, pred * 255, 0))
        ssims.append(calculate_ssim(
            (gt * 255).round().astype(np.uint8),
            (pred * 255).round().astype(np.uint8), 0))
        if lpips_fn is not None:
            lpipss.append(float(lpips_fn(gt[..., ::-1], pred[..., ::-1])))

    print(f"PSNR: {np.mean(psnrs):.4f} dB")
    print(f"SSIM: {np.mean(ssims):.4f}")
    if lpipss:
        print(f"LPIPS: {np.mean(lpipss):.4f}")
    return {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims))}


if __name__ == "__main__":
    main()
