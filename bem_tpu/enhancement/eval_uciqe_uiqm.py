"""Average UCIQE/UIQM over an image directory
(reference: Enhancement/eval_uciqe_uiqm.py).

python -m bem_tpu.enhancement.eval_uciqe_uiqm <img_dir>
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def get_average_UCIQE_and_UIQM(img_dir: str):
    import cv2

    from ..metrics import getUCIQE, getUIQM

    uciqes, uiqms = [], []
    for name in sorted(os.listdir(img_dir)):
        if not name.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".tif")):
            continue
        img = cv2.imread(os.path.join(img_dir, name), cv2.IMREAD_COLOR)
        if img is None:
            continue
        rgb = img[:, :, ::-1]
        uciqes.append(getUCIQE(rgb))
        uiqms.append(getUIQM(rgb))
    return float(np.mean(uciqes)), float(np.mean(uiqms))


def main(args_list=None):
    p = argparse.ArgumentParser(
        description="Calculate average UCIQE and UIQM for a directory of images."
    )
    p.add_argument("img_dir", type=str)
    args = p.parse_args(args_list)
    uciqe, uiqm = get_average_UCIQE_and_UIQM(args.img_dir)
    print(f"Average UCIQE: {uciqe:.4f}")
    print(f"Average UIQM: {uiqm:.4f}")


if __name__ == "__main__":
    main()
