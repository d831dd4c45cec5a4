"""Stage-II ImageEnhancer training-dynamics comparison vs the torch
reference (closes VERDICT #6's CG+IE pair together with cg_convergence.py).

Deterministic IE: input = concat(lq, upsampled condition) (6ch), L1 loss
(image_enhancer_model.py:165-216 minus the perceptual term, which is
weight-gated in this environment). Identical synthetic batches; AdamW +
grad-clip 1.0 both sides. Trajectories compared statistically (crop/RNG
parity is exact here since batches are fixed, but torch/jax dropout-free
forward noise differs only by fp rounding).

Run: python tools/ie_convergence.py --iters 200
"""

import argparse
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def synth_batches(n, B=2, hw=32, down=4, seed=5):
    rng = np.random.default_rng(seed)
    gt = rng.random((n, B, hw, hw, 3)).astype(np.float32)
    illum = rng.random((n, B, 1, 1, 3)).astype(np.float32) * 0.3 + 0.1
    lq = np.clip(gt * illum + rng.normal(0, 0.01, gt.shape), 0, 1).astype(np.float32)
    # mean-downsampled conditions of the gt (the training-time condition)
    conds = gt.reshape(n, B, hw // down, down, hw // down, down, 3).mean((3, 5))
    return lq, gt, conds.astype(np.float32)


def run_torch(iters, lq, gt, conds, lr=2e-4, seed=0):
    import torch
    import torch.nn.functional as F

    from ref_loader import load_ref_network_module

    ref_unet = load_ref_network_module()
    sys.modules.pop("triton", None)
    sys.modules.pop("triton.language", None)

    torch.manual_seed(seed)
    net = ref_unet.Network(in_channels=6, out_channels=3, n_feat=8, stage=1,
                           num_blocks=[1, 1, 1], d_state=[1, 1, 1],
                           ssm_ratio=1, mlp_ratio=2, mlp_type="gdmlp",
                           use_pixelshuffle=True)
    net.train()
    opt = torch.optim.AdamW(net.parameters(), lr=lr, weight_decay=1e-4,
                            betas=(0.9, 0.999))
    hist = []
    for it in range(iters):
        i = it % len(lq)
        lo = torch.from_numpy(lq[i]).permute(0, 3, 1, 2)
        hi = torch.from_numpy(gt[i]).permute(0, 3, 1, 2)
        cd = torch.from_numpy(conds[i]).permute(0, 3, 1, 2)
        up = F.interpolate(cd, scale_factor=4, mode="bilinear")
        _, preds = net(torch.cat([lo, up], dim=1))
        loss = torch.mean(torch.abs(preds - hi))
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(net.parameters(), 1.0)
        opt.step()
        hist.append({"iter": it, "l_pix": float(loss)})
        if (it + 1) % 50 == 0:
            print(f"[torch] {it+1}: l_pix {float(loss):.4f}", flush=True)
    return hist


def run_jax(iters, lq, gt, conds, lr=2e-4, seed=0):
    from bem_tpu.models import build_model

    opt = {
        "name": "ie_convergence", "model_type": "ImageEnhancer",
        "is_train": True, "manual_seed": seed,
        "condition": {"type": "mean", "scale_down": 4, "noise_level": 0.0},
        "network_g": {
            "type": "Network", "in_channels": 6, "out_channels": 3,
            "n_feat": 8, "stage": 1, "num_blocks": [1, 1, 1],
            "d_state": [1, 1, 1], "ssm_ratio": 1, "mlp_ratio": 2,
            "mlp_type": "gdmlp", "use_pixelshuffle": True,
        },
        "datasets": {"train": {"mini_batch_sizes": [int(lq.shape[1])]}},
        "path": {"experiments_root": "/tmp/ie_convergence"},
        "train": {
            "total_iter": iters, "warmup_iter": -1, "max_grad_norm": 1,
            "scheduler": {"type": "CosineAnnealingRestartCyclicLR",
                          "periods": [iters, iters],
                          "restart_weights": [1, 1],
                          "eta_mins": [lr, lr]},
            "optim_g": {"type": "AdamW", "lr": lr, "weight_decay": 1e-4,
                        "betas": [0.9, 0.999]},
            "mixing_augs": {"mixup": False},
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1,
                          "reduction": "mean"},
        },
    }
    model = build_model(opt)
    model.init_state({"lq": lq[0], "gt": gt[0], "gt_down": conds[0]}, seed=seed)
    hist = []
    for it in range(iters):
        i = it % len(lq)
        logs = model.train_step({"lq": lq[i], "gt": gt[i], "gt_down": conds[i]})
        hist.append({"iter": it, "l_pix": float(logs["l_pix"])})
        if (it + 1) % 50 == 0:
            print(f"[jax]   {it+1}: l_pix {hist[-1]['l_pix']:.4f}", flush=True)
    return hist


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--out", default="analysis/convergence/ie_deterministic.json")
    args = ap.parse_args()
    lq, gt, conds = synth_batches(32)
    out = {"config": vars(args)}
    out["jax"] = run_jax(args.iters, lq, gt, conds)
    out["torch"] = run_torch(args.iters, lq, gt, conds)
    jt = float(np.mean([r["l_pix"] for r in out["jax"][-40:]]))
    tt = float(np.mean([r["l_pix"] for r in out["torch"][-40:]]))
    out["summary"] = {"jax_l_pix_tail": jt, "torch_l_pix_tail": tt}
    print(json.dumps(out["summary"], indent=2))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
