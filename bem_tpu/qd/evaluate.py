"""QD decomposition evaluation (reference: basicsr/QD/evaluate.py:17-181).

python -m bem_tpu.qd.evaluate --model_type model4 --weights ckpt.msgpack \\
    --low_dir ... --high_dir ... [--out_dir results/qd]

Reconstruction PSNR/SSIM (+LPIPS when weights available) + RCI, and saves
Q1/Q2 component PNGs.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(args_list=None):
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from ..metrics import calculate_psnr, calculate_ssim
    from ..ops.quaternion import hamilton_product
    from ..utils.img_util import imread, imwrite
    from .models import Decomp
    from .rci import compute_rci

    p = argparse.ArgumentParser()
    p.add_argument("--model_type", default="model4")
    p.add_argument("--weights", default="",
                   help="msgpack params; default: shipped converted checkpoint")
    p.add_argument("--low_dir", required=True)
    p.add_argument("--high_dir", required=True)
    p.add_argument("--out_dir", default="results/qd_eval")
    p.add_argument("--lpips", action="store_true")
    p.add_argument("--save_components", action="store_true")
    args = p.parse_args(args_list)

    net = Decomp(model_type=args.model_type)
    if args.weights:
        with open(args.weights, "rb") as f:
            params = serialization.msgpack_restore(f.read())
        if "params" in params:
            params = params["params"]
    else:
        from .convert import load_decomp_params

        params = load_decomp_params(args.model_type)

    fwd = jax.jit(lambda x: net.apply({"params": params}, x))

    lpips_fn = None
    if args.lpips:
        from ..enhancement.lpips_jax import LPIPS

        lpips_fn = LPIPS()

    os.makedirs(args.out_dir, exist_ok=True)
    lows = sorted(os.listdir(args.low_dir))
    highs = sorted(os.listdir(args.high_dir))
    psnrs, ssims, lpipss, rcis = [], [], [], []
    for lname, hname in zip(lows, highs):
        low = imread(os.path.join(args.low_dir, lname))
        high = imread(os.path.join(args.high_dir, hname))
        h, w = low.shape[0] // 2 * 2, low.shape[1] // 2 * 2
        low, high = low[:h, :w], high[:h, :w]

        q1, q2 = fwd(jnp.asarray(low[None]))
        recon = np.clip(np.asarray(hamilton_product(q1, q2))[0, ..., 1:], 0, 1)
        psnrs.append(calculate_psnr(low * 255, recon * 255, 0))
        ssims.append(calculate_ssim(
            (low * 255).round().astype(np.uint8),
            (recon * 255).round().astype(np.uint8), 0))
        if lpips_fn is not None:
            lpipss.append(float(lpips_fn(low, recon)))
        rcis.append(float(compute_rci(fwd, low, high)))

        if args.save_components:
            base = os.path.splitext(lname)[0]
            q1n = np.asarray(q1)[0, ..., 1:]
            q2n = np.asarray(q2)[0, ..., 1:]
            for tag, arr in (("Q1", q1n), ("Q2", q2n), ("recon", recon)):
                imwrite(
                    (np.clip(arr, 0, 1)[..., ::-1] * 255).round().astype(np.uint8),
                    os.path.join(args.out_dir, f"{base}_{tag}.png"),
                )

    print(f"recon PSNR: {np.mean(psnrs):.3f} dB")
    print(f"recon SSIM: {np.mean(ssims):.4f}")
    if lpipss:
        print(f"LPIPS: {np.mean(lpipss):.4f}")
    print(f"RCI: {np.mean(rcis):.4f}")
    with open(os.path.join(args.out_dir, "result.txt"), "w") as f:
        f.write(f"PSNR: {np.mean(psnrs):.3f}\nSSIM: {np.mean(ssims):.4f}\n"
                f"RCI: {np.mean(rcis):.4f}\n")
    return {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims)),
            "rci": float(np.mean(rcis))}


if __name__ == "__main__":
    main()
