"""Bayesian CG training-dynamics comparison vs the torch reference
(VERDICT #6: "Bayesian CG training dynamics vs reference — KL
trajectories").

Trains the Stage-I ConditionGenerator with BOTH stacks on identical
synthetic (lq_down, gt_down) pairs:

- torch: reference Network (UNet_arch.py) converted with
  convert2bnn_selective({'sigma_init': 0.05, 'decay': 0.998})
  (condition_generator_model.py:51-59), AdamW, loss =
  L1 + 0.01 * get_kl_loss / batch (:184-189). Every stochastic forward
  EMA-updates the prior in place and resamples weights.
- jax: our ConditionGenerator model (bem_tpu/models/
  condition_generator_model.py) through its real train_step.

Weight-noise RNGs differ, so trajectories are compared statistically:
pixel-loss decrease, KL magnitude/trend bands. Results ->
analysis/convergence/cg_bayesian.json.

Run: python tools/cg_convergence.py --iters 300
"""

import argparse
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def synth_batches(n, B=4, hw=16, seed=3):
    rng = np.random.default_rng(seed)
    base_h = rng.random((n, B, hw, hw, 3)).astype(np.float32)
    illum = rng.random((n, B, 1, 1, 3)).astype(np.float32) * 0.3 + 0.1
    lows = np.clip(base_h * illum + rng.normal(0, 0.01, base_h.shape), 0, 1)
    return lows.astype(np.float32), base_h


def run_torch(iters, lows, highs, lr=2e-4, seed=0):
    import torch

    from ref_loader import load_ref_network_module

    ref_unet = load_ref_network_module()
    # drop ref_loader's triton stub: torch._dynamo probes
    # triton.language/triton.backends at first use (clip_grad_norm_) and
    # handles ABSENT triton fine but not a fake one
    sys.modules.pop("triton", None)
    sys.modules.pop("triton.language", None)
    # the reference bayesian package is standalone-importable (its tools.py
    # does `import bayesian`): put its parent on sys.path
    sys.path.insert(0, "/root/reference/basicsr")
    import bayesian as tools

    torch.manual_seed(seed)
    net = ref_unet.Network(in_channels=3, out_channels=3, n_feat=8, stage=1,
                           num_blocks=[1, 1, 1], d_state=[1, 1, 1],
                           ssm_ratio=1, mlp_ratio=2, mlp_type="gdmlp",
                           use_pixelshuffle=True)
    tools.convert2bnn_selective(
        net, {"sigma_init": 0.05, "decay": 0.998, "pretrain": False})
    net.train()
    opt = torch.optim.AdamW(net.parameters(), lr=lr, weight_decay=1e-4,
                            betas=(0.9, 0.999))
    B = lows.shape[1]
    hist = []
    for it in range(iters):
        lo = torch.from_numpy(lows[it % len(lows)])
        hi = torch.from_numpy(highs[it % len(highs)])
        _, preds = net(lo.permute(0, 3, 1, 2))
        l_kl = tools.get_kl_loss(net)
        l_pix = torch.mean(torch.abs(preds - hi.permute(0, 3, 1, 2)))
        loss = l_pix + 0.01 * l_kl / B
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(net.parameters(), 1.0)
        opt.step()
        hist.append({"iter": it, "l_pix": float(l_pix), "l_kl": float(l_kl)})
        if (it + 1) % 50 == 0:
            print(f"[torch] {it+1}: l_pix {float(l_pix):.4f} "
                  f"l_kl {float(l_kl):.4g}", flush=True)
    return hist


def run_jax(iters, lows, highs, lr=2e-4, seed=0):
    from bem_tpu.models import build_model

    opt = {
        "name": "cg_convergence", "model_type": "ConditionGenerator",
        "is_train": True, "manual_seed": seed,
        "sigma_init": 0.05,
        "condition": {"type": "mean", "scale_down": 4, "noise_level": 0.0},
        "network_g": {
            "type": "Network", "in_channels": 3, "out_channels": 3,
            "n_feat": 8, "stage": 1, "num_blocks": [1, 1, 1],
            "d_state": [1, 1, 1], "ssm_ratio": 1, "mlp_ratio": 2,
            "mlp_type": "gdmlp", "use_pixelshuffle": True,
        },
        "datasets": {"train": {"mini_batch_sizes": [int(lows.shape[1])]}},
        "path": {"experiments_root": "/tmp/cg_convergence"},
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
    batch0 = {"lq": lows[0], "gt": highs[0],
              "lq_down": lows[0], "gt_down": highs[0]}
    model.init_state(batch0, seed=seed)
    hist = []
    for it in range(iters):
        b = {"lq": lows[it % len(lows)], "gt": highs[it % len(highs)],
             "lq_down": lows[it % len(lows)], "gt_down": highs[it % len(highs)]}
        logs = model.train_step(b)
        hist.append({"iter": it, "l_pix": float(logs["l_pix"]),
                     "l_kl": float(logs.get("l_kl", 0.0))})
        if (it + 1) % 50 == 0:
            print(f"[jax]   {it+1}: l_pix {hist[-1]['l_pix']:.4f} "
                  f"l_kl {hist[-1]['l_kl']:.4g}", flush=True)
    return hist


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--out", default="analysis/convergence/cg_bayesian.json")
    ap.add_argument("--skip_torch", action="store_true")
    ap.add_argument("--skip_jax", action="store_true")
    args = ap.parse_args()

    lows, highs = synth_batches(32)
    out = {"config": vars(args)}
    if not args.skip_jax:
        out["jax"] = run_jax(args.iters, lows, highs)
    if not args.skip_torch:
        out["torch"] = run_torch(args.iters, lows, highs)
    if "jax" in out and "torch" in out:
        def tailmean(h, k):
            return float(np.mean([r[k] for r in h[-50:]]))

        out["summary"] = {
            "jax_l_pix_tail": tailmean(out["jax"], "l_pix"),
            "torch_l_pix_tail": tailmean(out["torch"], "l_pix"),
            "jax_l_kl_tail": tailmean(out["jax"], "l_kl"),
            "torch_l_kl_tail": tailmean(out["torch"], "l_kl"),
            "jax_l_kl_start": float(np.mean([r["l_kl"] for r in out["jax"][:10]])),
            "torch_l_kl_start": float(np.mean([r["l_kl"] for r in out["torch"][:10]])),
        }
        print(json.dumps(out["summary"], indent=2))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
