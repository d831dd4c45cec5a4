"""QD train-to-convergence comparison vs the torch reference (VERDICT #6).

Generates deterministic synthetic LOL-style paired data, trains the QD
decomposition with BOTH stacks on it — the torch reference loop
(basicsr/QD/train2.py:176-290 semantics: AdamW default wd, constant-lr
warmup -> CosineAnnealingLR stepped per epoch, recon-only loss for the
first 50 epochs, extended RetinexLoss after) and our TPU trainer
(bem_tpu/qd/train.py) — and writes both loss/PSNR trajectories plus a
comparison summary to analysis/convergence/.

Batching/crop RNG differs between the stacks, so trajectories are compared
statistically (epoch-mean loss bands + final reconstruction PSNR), not
step-for-step.

Run:  python tools/qd_convergence.py --epochs 120 [--skip_torch]
"""

import argparse
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

QD_REF = "/root/reference/basicsr/QD"


def make_synth_data(root: str, n_train: int = 16, n_val: int = 4,
                    size: int = 96, seed: int = 7):
    import cv2

    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        lo_d = os.path.join(root, split, "low")
        hi_d = os.path.join(root, split, "high")
        os.makedirs(lo_d, exist_ok=True)
        os.makedirs(hi_d, exist_ok=True)
        for i in range(n):
            base = rng.random((size // 8, size // 8, 3))
            high = cv2.resize(base, (size, size), interpolation=cv2.INTER_CUBIC)
            high = np.clip(high * 0.8 + 0.15, 0, 1)
            illum = cv2.resize(rng.random((size // 16, size // 16, 1)),
                               (size, size))[..., None] * 0.25 + 0.08
            low = np.clip(high * illum + rng.normal(0, 0.01, high.shape), 0, 1)
            cv2.imwrite(os.path.join(hi_d, f"{i:03d}.png"),
                        (high[..., ::-1] * 255).astype(np.uint8))
            cv2.imwrite(os.path.join(lo_d, f"{i:03d}.png"),
                        (low[..., ::-1] * 255).astype(np.uint8))
    return root


def run_torch(data_root, epochs, batch_size, patch, lr, seed=0):
    """Reference training loop, faithfully reduced from train2.py."""
    import importlib.util

    import torch
    from torch.utils.data import DataLoader as TorchLoader
    from torch.optim.lr_scheduler import (CosineAnnealingLR, LinearLR,
                                          SequentialLR)

    sys.path.insert(0, QD_REF)

    def load(name):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(QD_REF, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("quaternion")
    ds_mod = load("dataset")
    model4 = load("model4")

    # train2's RetinexLoss (with freq/tv extensions) lives inside train2.py;
    # import it with heavy deps stubbed
    import types

    tm = types.ModuleType("torchmetrics")
    tmi = types.ModuleType("torchmetrics.image")
    tmi.PeakSignalNoiseRatio = object
    tmi.StructuralSimilarityIndexMeasure = object
    tm.image = tmi
    sys.modules.setdefault("torchmetrics", tm)
    sys.modules.setdefault("torchmetrics.image", tmi)
    train2 = load("train2")

    torch.manual_seed(seed)
    np.random.seed(seed)
    ds = ds_mod.PairDataset(os.path.join(data_root, "train", "low"),
                            os.path.join(data_root, "train", "high"),
                            patch_size=patch)
    loader = TorchLoader(ds, batch_size=batch_size, shuffle=True, num_workers=0)
    model = model4.Decomp()
    opt = torch.optim.AdamW(model.parameters(), lr=lr, betas=(0.9, 0.999))
    warmup = 10
    sch = SequentialLR(
        opt,
        schedulers=[LinearLR(opt, start_factor=1.0, total_iters=warmup),
                    CosineAnnealingLR(opt, T_max=epochs - warmup, eta_min=1e-7)],
        milestones=[warmup])
    sch.step()
    crit = train2.RetinexLoss()

    hist = []
    for epoch in range(epochs):
        model.train()
        losses = []
        for low, high in loader:
            q1l, q2l = model(low)
            q1h, q2h = model(high)
            ld = crit(q1l, q2l, low, q1h, q2h, high)
            if epoch < 50:
                loss = ld["recon_loss_low"] + ld["recon_loss_high"]
            else:
                loss = ld["loss_Decom"]
            opt.zero_grad()
            loss.backward()
            opt.step()
            losses.append(float(loss))
        sch.step()
        rec = {"epoch": epoch, "loss": float(np.mean(losses))}
        if (epoch + 1) % 10 == 0 or epoch == epochs - 1:
            # recon PSNR on val lows (train2.py:292-318 protocol)
            from quaternion import hamilton_product as hp

            model.eval()
            vds = ds_mod.PairDataset(os.path.join(data_root, "val", "low"),
                                     os.path.join(data_root, "val", "high"),
                                     patch_size=patch)
            ps = []
            with torch.no_grad():
                for k in range(len(vds)):
                    low, _ = vds[k]
                    low = low[None]
                    q1, q2 = model(low)
                    recon = hp(q1, q2)[:, 1:].clamp(0, 1)
                    mse = torch.mean((recon - low) ** 2)
                    ps.append(float(10 * torch.log10(1.0 / mse)))
            rec["recon_psnr"] = float(np.mean(ps))
            print(f"[torch] epoch {epoch}: loss {rec['loss']:.4f} "
                  f"recon PSNR {rec['recon_psnr']:.2f}", flush=True)
        hist.append(rec)
    return hist


def run_jax(data_root, epochs, batch_size, patch, lr, out_dir, seed=0):
    from bem_tpu.qd.train import train_qd

    _, hist = train_qd(
        model_type="model4",
        low_dir=os.path.join(data_root, "train", "low"),
        high_dir=os.path.join(data_root, "train", "high"),
        val_low_dir=os.path.join(data_root, "val", "low"),
        val_high_dir=os.path.join(data_root, "val", "high"),
        epochs=epochs, batch_size=batch_size, patch_size=patch, lr=lr,
        recon_only_epochs=50, out_dir=out_dir, seed=seed, num_workers=0,
        log_every=1000, save_every=10_000,
    )
    return hist


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--patch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--data_root", default="/tmp/qd_syn")
    ap.add_argument("--out", default="analysis/convergence/qd_model4.json")
    ap.add_argument("--skip_torch", action="store_true")
    ap.add_argument("--skip_jax", action="store_true")
    args = ap.parse_args()

    make_synth_data(args.data_root)
    out = {"config": vars(args)}
    if not args.skip_jax:
        out["jax"] = run_jax(args.data_root, args.epochs, args.batch_size,
                             args.patch, args.lr, "/tmp/qd_syn_run")
    if not args.skip_torch:
        out["torch"] = run_torch(args.data_root, args.epochs,
                                 args.batch_size, args.patch, args.lr)

    if "jax" in out and "torch" in out:
        jl = np.array([r["loss"] for r in out["jax"]])
        tl = np.array([r["loss"] for r in out["torch"]])
        tail = slice(args.epochs - 20, args.epochs)
        out["summary"] = {
            "jax_final_loss_mean20": float(jl[tail].mean()),
            "torch_final_loss_mean20": float(tl[tail].mean()),
            "jax_final_recon_psnr": out["jax"][-1].get("recon_psnr"),
            "torch_final_recon_psnr": out["torch"][-1].get("recon_psnr"),
        }
        print(json.dumps(out["summary"], indent=2))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
