"""Train-iteration wall-clock vs the reference's measured number.

Reference: log_DecompDualBranch2_4.out tail — 0.31 s/train-iter at batch 8,
patch 128, single CUDA GPU, flagship-family dual-branch arch with L1 +
0.01*VGG19 perceptual. This script times the equivalent bem_tpu train step
on the TPU: ImageEnhancer with DecompDualBranch2 (or the wavelet flagship
via --arch), batch 8, 128x128, same objective (perceptual included iff
BEM_VGG19_WEIGHTS is set — use tools/convert_vgg19.py --seeded in
zero-egress environments).

Run: python tools/train_iter_bench.py [--arch DecompDualBranchDDWavelet]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="DecompDualBranch2")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--trace", default="",
                    help="profile dir: capture one steady-state train step "
                         "under jax.profiler and print device-op buckets "
                         "(tools/trace_buckets.py parser)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bem_tpu.models import build_model

    # flagship training geometry (Options/DecompDualBranch2DDWavelet_4.yml)
    net = dict(type=args.arch, in_channels=6, out_channels=3, n_feat=40,
               stage=1, num_blocks=[2, 2, 2], d_state=[1, 1, 1], ssm_ratio=1,
               mlp_ratio=4, mlp_type="gdmlp", use_pixelshuffle=True)
    if "Wavelet" in args.arch or "DD" in args.arch:
        net["decomp_model"] = "model4"
    train = {
        "total_iter": 1000, "warmup_iter": -1, "max_grad_norm": 1,
        "scheduler": {"type": "CosineAnnealingRestartCyclicLR",
                      "periods": [500, 500], "restart_weights": [1, 1],
                      "eta_mins": [2e-4, 1e-6]},
        "optim_g": {"type": "AdamW", "lr": 2e-4, "weight_decay": 1e-4,
                    "betas": [0.9, 0.999]},
        "mixing_augs": {"mixup": False},
        "pixel_opt": {"type": "L1Loss", "loss_weight": 1,
                      "reduction": "mean"},
    }
    if os.environ.get("BEM_VGG19_WEIGHTS"):
        train["perceptual_opt"] = {
            "type": "PerceptualLoss", "layer_weights": {"conv5_4": 1},
            "vgg_type": "vgg19", "use_input_norm": True, "range_norm": False,
            "perceptual_weight": 0.01, "style_weight": 0, "criterion": "l1"}
    opt = {
        "name": "train_iter_bench", "model_type": "ImageEnhancer",
        "is_train": True, "manual_seed": 0,
        "condition": {"type": "mean", "scale_down": 4, "noise_level": 0.0},
        "network_g": net,
        "datasets": {"train": {"mini_batch_sizes": [args.batch]}},
        "path": {"experiments_root": "/tmp/train_iter_bench"},
        "train": train,
    }
    model = build_model(opt)

    rng = np.random.default_rng(0)
    B, P = args.batch, args.patch
    batch = {
        "lq": rng.random((B, P, P, 3), np.float32),
        "gt": rng.random((B, P, P, 3), np.float32),
        "gt_down": rng.random((B, P // 4, P // 4, 3), np.float32),
    }
    model.init_state(batch, seed=0)

    t0 = time.perf_counter()
    logs = model.train_step(batch)
    warm = time.perf_counter() - t0

    # strict protocol == the reference's steady-state loop semantics
    # (log_DecompDualBranch2_4.out, 0.31 s/iter): a FRESH batch is fed
    # every step and the loss dict is synced every step
    # (basicsr/models/base_model.py:419 reduce_loss_dict .item()).
    # The reference's dataloader overlaps its H2D copy with compute
    # (pin_memory prefetcher; its measured data_time is 0.01 s), so the
    # equivalent here dispatches the NEXT batch's device_put before
    # fetching the current loss — upload rides the tunnel while the chip
    # works. Distinct host batches per iter prevent any buffer reuse.
    import jax.numpy as jnp

    host_batches = []
    for i in range(args.iters + 1):
        host_batches.append({
            "lq": rng.random((B, P, P, 3), np.float32),
            "gt": rng.random((B, P, P, 3), np.float32),
            "gt_down": rng.random((B, P // 4, P // 4, 3), np.float32),
        })
    cur = jax.device_put(host_batches[0])
    ts = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        logs = model.train_step(cur)
        cur = jax.device_put(host_batches[i + 1])  # overlap next upload
        float(logs["l_pix"])  # per-iter sync, like the reference
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))

    # pipelined: batch pre-uploaded once, steps dispatched back-to-back, one
    # log fetch at the end — what a training loop with the repo's prefetcher
    # + periodic logging actually does. The strict number above pays a
    # host->device upload and a ~30 ms tunnel scalar fetch EVERY step.
    import jax.numpy as jnp

    batch_dev = {k: jnp.asarray(v) for k, v in batch.items()}
    logs = model.train_step(batch_dev)
    float(logs["l_pix"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        logs = model.train_step(batch_dev)
    float(logs["l_pix"])
    pipelined = (time.perf_counter() - t0) / args.iters

    if args.trace:
        os.system(f"rm -rf {args.trace}")
        jax.profiler.start_trace(args.trace)
        logs = model.train_step(batch)
        float(logs["l_pix"])
        jax.profiler.stop_trace()
        from collections import defaultdict

        from trace_buckets import classify, parse_trace

        per_op = parse_trace(args.trace)
        total = sum(per_op.values())
        if not total:
            print("== train-step trace: no device plane (not on TPU?) ==")
            per_op = {}
        buckets = defaultdict(float)
        for name, ms in per_op.items():
            buckets[classify(name)] += ms
        print(f"== train-step buckets (device total {total:.1f} ms) ==")
        for label, ms in sorted(buckets.items(), key=lambda kv: -kv[1]):
            print(f"{label:28s} {ms:8.1f} ms  {100*ms/total:5.1f}%")
        print("== top 25 ops ==")
        for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:25]:
            print(f"{ms:9.2f} ms  {name[:110]}")

    print(json.dumps({
        "arch": args.arch, "batch": B, "patch": P,
        "s_per_iter_median": round(med, 4),
        "s_per_iter_min": round(float(min(ts)), 4),
        "s_per_iter_pipelined": round(pipelined, 4),
        "warmup_s": round(warm, 1),
        "perceptual": "perceptual_opt" in train,
        "ref_s_per_iter": 0.31,
        "vs_ref": round(0.31 / med, 2),
    }))


if __name__ == "__main__":
    main()
