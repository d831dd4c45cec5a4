"""Flagship full-objective training-dynamics comparison vs torch
(VERDICT r2 #7): DecompDualBranchDDWavelet trained with the COMPLETE
reference objective — L1 + 0.01*VGG19-conv5_4 perceptual
(Options/DecompDualBranch2DDWavelet_4.yml:100-115) — jax vs the torch
reference on identical synthetic batches, from IDENTICAL initial weights
(torch init converted via convert_dualbranch_state), with the frozen QD
model4 decomp on both sides.

The environment has zero egress so the ImageNet VGG19 weights cannot be
fetched; the perceptual PATH is instead proven with a fixed-seed random
VGG19 that both frameworks share bit-exactly (torch init -> npz ->
BEM_VGG19_WEIGHTS). The pretrained values are data, not framework code:
matching trajectories here cover everything tools/convert_vgg19.py would
feed (basicsr/losses/basic_loss.py:147-253, basicsr/archs/vgg_arch.py).

Run: python tools/ie_wavelet_convergence.py --iters 200
"""

import argparse
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

VGG_NPZ = "/tmp/bem_vgg19_seeded.npz"

TINY = dict(in_channels=6, out_channels=3, n_feat=8, stage=1,
            num_blocks=[1, 1], d_state=[1, 1], ssm_ratio=1, mlp_ratio=2,
            mlp_type="gdmlp", use_pixelshuffle=True, decomp_model="model4")

PERCEPTUAL_OPT = {  # Options/DecompDualBranch2DDWavelet_4.yml:105-115
    "type": "PerceptualLoss",
    "layer_weights": {"conv5_4": 1},
    "vgg_type": "vgg19",
    "use_input_norm": True,
    "range_norm": False,
    "perceptual_weight": 0.01,
    "style_weight": 0,
    "criterion": "l1",
}


def synth_batches(n, B=2, hw=32, down=4, seed=5):
    rng = np.random.default_rng(seed)
    gt = rng.random((n, B, hw, hw, 3)).astype(np.float32)
    illum = rng.random((n, B, 1, 1, 3)).astype(np.float32) * 0.3 + 0.1
    lq = np.clip(gt * illum + rng.normal(0, 0.01, gt.shape), 0, 1).astype(np.float32)
    conds = gt.reshape(n, B, hw // down, down, hw // down, down, 3).mean((3, 5))
    return lq, gt, conds.astype(np.float32)


def make_seeded_vgg(seed=7):
    """Torch VGG19 features (cfg E) with fixed-seed torch-default init;
    exports the npz both frameworks consume. Returns the torch module."""
    import torch
    import torch.nn as nn

    from bem_tpu.losses.perceptual import VGG19_LAYERS

    torch.manual_seed(seed)
    convs = {}
    mods = []
    in_ch = 3
    for name, out_ch in VGG19_LAYERS:
        if name.startswith("pool"):
            mods.append(nn.MaxPool2d(2, 2))
            continue
        c = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        # variance-preserving init: torch's default kaiming_uniform(a=sqrt(5))
        # shrinks activations ~0.3x per layer, so conv5_4 features (16 convs
        # deep) collapse to ~1e-9 and the perceptual gradient vanishes —
        # relu-gain init keeps the term material so the comparison actually
        # exercises the perceptual backward path
        nn.init.kaiming_normal_(c.weight, nonlinearity="relu")
        convs[name] = c
        mods.append(c)
        in_ch = out_ch

    out = {}
    for name, c in convs.items():
        out[f"{name}.kernel"] = (
            c.weight.detach().numpy().transpose(2, 3, 1, 0))
        out[f"{name}.bias"] = c.bias.detach().numpy()
    np.savez(VGG_NPZ, **out)

    class VGGSlice(nn.Module):
        """conv5_4 features, pre-relu, with ImageNet input norm
        (vgg_arch.py:55-161)."""

        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

        def __init__(self):
            super().__init__()
            self.seq = nn.Sequential(*mods)

        def forward(self, x):
            x = (x - self.mean) / self.std
            for m in self.seq:
                if isinstance(m, nn.Conv2d):
                    x = m(x)
                    if m is convs["conv5_4"]:
                        return x
                    x = torch.relu(x)
                else:
                    x = m(x)
            raise AssertionError

    vgg = VGGSlice()
    vgg.eval()
    for p in vgg.parameters():
        p.requires_grad = False
    return vgg


def build_ref(seed=0):
    """Reference flagship on CPU: chunked-oracle scan patch + cwd/map_location
    tricks for the QD checkpoint (see tests/test_fullscale_parity.py)."""
    import importlib.util

    import torch

    from ref_loader import load_ref_ddwavelet_module

    arch_mod = load_ref_ddwavelet_module()
    spec = importlib.util.spec_from_file_location(
        "ref_scan_easy",
        "/root/reference/kernels/selective_scan/test_selective_scan_easy.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_scan_easy"] = mod
    try:
        spec.loader.exec_module(mod)
    except ModuleNotFoundError:
        pass
    easy = mod.selective_scan_easy

    def fast_scan(u, delta, A, B, C, D=None, delta_bias=None,
                  delta_softplus=True, *args, **kwargs):
        return easy(u, delta, A, B, C, D, delta_bias=delta_bias,
                    delta_softplus=delta_softplus, chunksize=8)

    sys.modules["basicsr.vmamba.models.csms6s"].selective_scan_fn = fast_scan
    sys.modules["basicsr.vmamba.models.vmamba"].selective_scan_fn = fast_scan

    torch.manual_seed(seed)
    cwd = os.getcwd()
    os.chdir("/root/reference")
    _load = torch.load
    torch.load = lambda *a, **k: _load(*a, **{**k, "map_location": "cpu"})
    try:
        ref = arch_mod.DecompDualBranchDDWavelet(**TINY)
    finally:
        torch.load = _load
        os.chdir(cwd)
    # drop ref_loader's triton stub: torch._dynamo probes triton.backends
    # at first use (clip_grad_norm_) and handles ABSENT triton fine but
    # not a fake one (same workaround as tools/cg_convergence.py:49-53)
    sys.modules.pop("triton", None)
    sys.modules.pop("triton.language", None)
    return ref


def run_torch(net, vgg, iters, lq, gt, conds, lr=2e-4):
    import torch
    import torch.nn.functional as F

    net.train()
    net.decomp.eval()
    trainable = [p for p in net.parameters() if p.requires_grad]
    opt = torch.optim.AdamW(trainable, lr=lr, weight_decay=1e-4,
                            betas=(0.9, 0.999))
    hist = []
    for it in range(iters):
        i = it % len(lq)
        lo = torch.from_numpy(lq[i]).permute(0, 3, 1, 2)
        hi = torch.from_numpy(gt[i]).permute(0, 3, 1, 2)
        cd = torch.from_numpy(conds[i]).permute(0, 3, 1, 2)
        up = F.interpolate(cd, scale_factor=4, mode="bilinear")
        preds = net(torch.cat([lo, up], dim=1))[-1]
        l_pix = torch.mean(torch.abs(preds - hi))
        with torch.no_grad():
            f_gt = vgg(hi)
        l_percep = 0.01 * torch.mean(torch.abs(vgg(preds) - f_gt))
        loss = l_pix + l_percep
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(trainable, 1.0)
        opt.step()
        hist.append({"iter": it, "l_pix": float(l_pix),
                     "l_percep": float(l_percep)})
        if (it + 1) % 25 == 0:
            print(f"[torch] {it+1}: l_pix {float(l_pix):.4f} "
                  f"l_percep {float(l_percep):.6f}", flush=True)
    return hist


def run_jax(init_sd, iters, lq, gt, conds, lr=2e-4, seed=0):
    import jax
    import jax.numpy as jnp

    from bem_tpu.archs.convert_network import convert_dualbranch_state
    from bem_tpu.models import build_model

    opt = {
        "name": "ie_wavelet_full", "model_type": "ImageEnhancer",
        "is_train": True, "manual_seed": seed,
        "condition": {"type": "mean", "scale_down": 4, "noise_level": 0.0},
        "network_g": dict(type="DecompDualBranchDDWavelet", **TINY),
        "datasets": {"train": {"mini_batch_sizes": [int(lq.shape[1])]}},
        "path": {"experiments_root": "/tmp/ie_wavelet_full"},
        "train": {
            "total_iter": iters, "warmup_iter": -1, "max_grad_norm": 1,
            "scheduler": {"type": "CosineAnnealingRestartCyclicLR",
                          "periods": [iters, iters],
                          "restart_weights": [1, 1], "eta_mins": [lr, lr]},
            "optim_g": {"type": "AdamW", "lr": lr, "weight_decay": 1e-4,
                        "betas": [0.9, 0.999]},
            "mixing_augs": {"mixup": False},
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1,
                          "reduction": "mean"},
            "perceptual_opt": dict(PERCEPTUAL_OPT),
        },
    }
    model = build_model(opt)
    model.init_state({"lq": lq[0], "gt": gt[0], "gt_down": conds[0]},
                     seed=seed)
    # identical start: overwrite the trainable branches with the converted
    # torch init (the frozen decomp already bit-matches via load_frozen)
    converted = convert_dualbranch_state(
        init_sd, num_blocks=tuple(TINY["num_blocks"]))
    params = dict(model.state.params)
    params["branches"] = jax.tree.map(jnp.asarray, converted["branches"])
    model.state = model.state.replace(params=params)

    hist = []
    for it in range(iters):
        i = it % len(lq)
        logs = model.train_step({"lq": lq[i], "gt": gt[i],
                                 "gt_down": conds[i]})
        hist.append({"iter": it, "l_pix": float(logs["l_pix"]),
                     "l_percep": float(logs["l_percep"]) * 0.01})
        if (it + 1) % 25 == 0:
            print(f"[jax]   {it+1}: l_pix {hist[-1]['l_pix']:.4f} "
                  f"l_percep {hist[-1]['l_percep']:.6f}", flush=True)
    return hist


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--out",
                    default="analysis/convergence/ie_wavelet_full.json")
    args = ap.parse_args()

    os.environ["BEM_VGG19_WEIGHTS"] = VGG_NPZ
    vgg = make_seeded_vgg()
    ref = build_ref()
    init_sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    lq, gt, conds = synth_batches(32)
    out = {"config": vars(args), "objective": "L1 + 0.01*VGG19-conv5_4"}
    out["jax"] = run_jax(init_sd, args.iters, lq, gt, conds)
    out["torch"] = run_torch(ref, vgg, args.iters, lq, gt, conds)

    jp = np.array([r["l_pix"] for r in out["jax"]])
    tp = np.array([r["l_pix"] for r in out["torch"]])
    jv = np.array([r["l_percep"] for r in out["jax"]])
    tv = np.array([r["l_percep"] for r in out["torch"]])
    out["summary"] = {
        "jax_l_pix_tail": float(jp[-40:].mean()),
        "torch_l_pix_tail": float(tp[-40:].mean()),
        "jax_l_percep_tail": float(jv[-40:].mean()),
        "torch_l_percep_tail": float(tv[-40:].mean()),
        "max_abs_dpix_first20": float(np.abs(jp[:20] - tp[:20]).max()),
        "max_abs_dpercep_first20": float(np.abs(jv[:20] - tv[:20]).max()),
    }
    print(json.dumps(out["summary"], indent=2))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
