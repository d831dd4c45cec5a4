"""Driver benchmark: two-stage Bayesian enhancement throughput on one chip.

Metric (BASELINE.json): LOLv1-size (600x400) images/sec/chip at K=16
Bayesian samples — i.e. complete two-stage pipelines per second, each one:
  1. downsample x16 condition input,
  2. K=16 stochastic Stage-I (Bayesian CG U-Net) forwards == one vmapped
     batch over K PRNG keys,
  3. upsample conditions x16, concat with the full-res input,
  4. K=16 Stage-II (IE U-Net) forwards == one K-batch,
  5. on-device candidate selection with the REAL no-reference scorer:
     batched NIQE (metrics/niqe_jax.py) + argmin, all inside the same
     compiled program (the reference scores NIQE on the host,
     Enhancement/eval.py NIQE branch).

Two images ride each pipeline call (NIMG=2): throughput-mode serving
batch; images/sec divides accordingly.

The reference protocol (Enhancement/eval.py:199-243) runs step 2 as K
sequential CUDA forwards and step 4 in chunks of parallel_num; the TPU
pipeline is one compiled program.

vs_baseline: the reference publishes no A100 throughput (speed_test.py
defines the protocol but no recorded result; BASELINE.md). Derivation from
the only measured reference-GPU number in the snapshot
(log_DecompDualBranch2_4.out tail: 0.31 s/train-iter, batch 8, patch 128,
single CUDA GPU):

  - train iter ~ fwd + bwd ~ 3x fwd cost -> measured fwd rate
    0.31 / (3 * 8 * 128^2) = 0.79 us/pixel for the dual-branch model;
  - the dual-branch wavelet arch is ~2x the FLOPs/pixel of the CG/IE
    `Network` pair benchmarked here (Network fwd = 197.6 GFLOP at 448x640
    = 688 kFLOP/px by XLA cost analysis) -> ~0.40 us/px for this pipeline;
  - one pipeline = K=16 IE forwards at 448x640 (CG at /16 resolution is
    <1% extra) = 16 * 286720 px -> 1.8 s -> 0.55 pipelines/s on their GPU;
  - the log does not name the GPU; granting the reference an A100 at a
    generous 2.4x the measured machine's effective throughput (covers both
    a mid-range source GPU and eval-path batching wins) gives
    ~1.3 pipelines/s.

This replaces the round-1 guess of 2.5 (which assumed roofline-ish A100
utilization the reference's eager sequential-K loop does not reach).
vs_baseline > 10 is the north star.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_PIPELINES_PER_SEC = 1.3  # derived A100 PyTorch ref (see docstring)
K = 16
H, W = 400, 600  # LOLv1 image size (rows x cols)
SCALE_DOWN = 16
# eval.py:146-172 reflect-pads the input to a multiple of 4*scale_factor so
# the /16 condition grid divides the CG U-Net's 2 downsampling levels
WINDOW = 4 * SCALE_DOWN


def build_pipeline(nimg: int = 2, scorer: str = "niqe"):
    """The benched two-stage serving pipeline: jitted fn + example args.

    Shared by main() and the trace tooling (tools/trace_buckets.py) so
    profiles measure exactly the program of record.

    scorer: "niqe" (default metric of record) or "clip" — driver config #4
    specifies CLIP no-reference selection (Enhancement/eval.py:229-243);
    the clip mode runs the flax ViT-B/32 tower (enhancement/clip_flax.py)
    as the in-program selection stage so the protocol cost is measured.
    Real openai weights are egress-gated; the seeded bundle
    (tools/convert_clip.py --seeded) is architecturally identical, so the
    measured cost carries over when real weights drop in.
    """
    import os

    # persistent compile cache: the remote-compile service on this host
    # intermittently degrades to >10-minute compiles; the pipeline program
    # is cached here from prior runs
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from bem_tpu.archs import build_network
    from bem_tpu.metrics.niqe_jax import niqe_batch_rgb
    from bem_tpu.ops.resize import resize_bilinear

    # flagship-size CG (bayesian) and IE nets (UNet_arch.py build_model defaults)
    common = dict(
        n_feat=40, stage=1, num_blocks=(2, 2, 2), d_state=(1, 1, 1),
        ssm_ratio=1, mlp_ratio=4, mlp_type="gdmlp", use_pixelshuffle=True,
    )
    # measured (round 4): forcing the /16-res CG stage onto scan_backend=
    # "xla" LOSES (1.87 vs 2.02 img/s) — the pallas kernels win even at
    # CG sizes, so the CG net takes the default backend like everything else
    cg = build_network(dict(type="Network", in_channels=3, out_channels=3,
                            bayesian=True, **common))
    ie = build_network(dict(type="Network", in_channels=6, out_channels=3, **common))

    # pad to window multiples (eval.py pads to multiple of 4*scale)
    ph = (WINDOW - H % WINDOW) % WINDOW
    pw = (WINDOW - W % WINDOW) % WINDOW
    Hp, Wp = H + ph, W + pw
    hc, wc = Hp // SCALE_DOWN, Wp // SCALE_DOWN

    NIMG = nimg  # images per pipeline call (throughput serving batch)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((NIMG, Hp, Wp, 3)), jnp.bfloat16)
    cond_in = jnp.asarray(rng.random((NIMG, hc, wc, 3)), jnp.bfloat16)

    cg_vars = jax.jit(cg.init)(jax.random.PRNGKey(0), cond_in[:1])
    ie_vars = jax.jit(ie.init)(
        jax.random.PRNGKey(1), jnp.concatenate([img[:1], img[:1]], -1))
    # real no-reference scorer, on device (metrics/niqe_jax.py): the same
    # NIQE the eval CLI uses for --no_ref niqe, scored on the CROPPED
    # 400x600 candidates like the reference protocol
    niqe_fn = niqe_batch_rgb(H, W, round_rgb=False)

    clip_params = None
    if scorer == "clip":
        import os as _os

        from bem_tpu.enhancement.clip_flax import (
            clip_iqa_score_fn, load_clip_iqa_npz)

        npz = _os.environ.get(
            "BEM_CLIP_NPZ", "bem_tpu/enhancement/weights/clip_iqa_vitb32.npz")
        params, text_embeds, prompts, scale = load_clip_iqa_npz(npz)
        clip_score = clip_iqa_score_fn(text_embeds, prompts, scale)
        clip_params = jax.tree.map(jnp.asarray, params)

    def pipeline(key, img, cond_in, clip_params=None):
        keys = jax.random.split(key, K)
        # Stage I: K Bayesian samples as one vmapped batch over all images
        conds = jax.vmap(
            lambda k: cg.apply(cg_vars, cond_in, rngs={"bayes": k})[-1]
        )(keys)  # (K, NIMG, hc, wc, 3)
        conds = jnp.clip(conds, 0.0, 1.0).reshape(K * NIMG, hc, wc, 3)
        up = resize_bilinear(conds, size=(Hp, Wp)).astype(img.dtype)
        inp = jnp.concatenate(
            [jnp.broadcast_to(img[None], (K,) + img.shape).reshape(
                K * NIMG, Hp, Wp, 3), up], axis=-1
        )
        preds = ie.apply(ie_vars, inp)[-1]  # (K*NIMG, Hp, Wp, 3)
        # on-device candidate selection: NIQE over the K candidates of each
        # image (lower is better), like eval.py --no_ref niqe
        cand = jnp.clip(
            preds.reshape(K, NIMG, Hp, Wp, 3)[:, :, :H, :W, :], 0.0, 1.0)
        if scorer == "clip":
            # higher is better (eval.py --no_ref clip: prompt-pair softmax
            # mean, brightness damped 0.7)
            scores = clip_score(
                clip_params, cand.reshape(K * NIMG, H, W, 3)).reshape(K, NIMG)
            best = jnp.argmax(scores, axis=0)  # (NIMG,)
        else:
            scores = niqe_fn(cand.reshape(K * NIMG, H, W, 3)).reshape(K, NIMG)
            best = jnp.argmin(scores, axis=0)  # (NIMG,)
        sel = cand[best, jnp.arange(NIMG)]
        # return a scalar so the timing loop forces a real device fetch
        # (block_until_ready is a no-op on some remote TPU transports)
        return jnp.mean(sel.astype(jnp.float32))

    fn = jax.jit(pipeline)
    key = jax.random.PRNGKey(42)
    if scorer == "clip":
        return fn, (key, img, cond_in, clip_params)
    return fn, (key, img, cond_in)


def _tpu_reachable(timeout_s: float = 300.0) -> bool:
    """Probe the TPU backend in a KILLABLE subprocess.

    Under the axon transport, the first jax import dials the TPU pool and
    hangs indefinitely when the tunnel is down (BENCH_r03 was rc=1 with a
    backend-init traceback; the multichip gate hung outright). Probing in a
    child bounds the damage and lets us emit a structured record instead.
    """
    import os
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.devices()[0].platform != 'cpu'"],
            timeout=timeout_s, env=dict(os.environ),
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--scorer", default="niqe", choices=["niqe", "clip"],
                    help="in-program no-reference selection stage; the "
                         "driver metric of record uses niqe, `clip` "
                         "measures driver-config-#4's CLIP protocol cost")
    cli = ap.parse_args()
    NIMG = 2
    if not _tpu_reachable():
        # honest weather record: the metric needs the chip; a dead tunnel
        # must not leave a bare traceback as the round's only artifact
        print(json.dumps({
            "metric": "LOLv1 600x400 images/sec/chip @ K=16 two-stage Bayesian",
            "value": None,
            "unit": "images/sec",
            "error": "TPU backend unreachable (transport tunnel down); "
                     "bench requires the real chip",
        }))
        return
    fn, ex_args = build_pipeline(NIMG, scorer=cli.scorer)
    key, rest = ex_args[0], ex_args[1:]
    import jax

    # ---- self-validating timing protocol (round-3 hardening) ----------------
    # The remote-compile/tunnel path on this host intermittently degrades
    # (first warmup has exceeded 10 minutes; individual dispatches can stall),
    # which made a single mean-of-10 window under-report by 40% (BENCH_r02:
    # 0.78 recorded vs 1.28 reproducible). Median of per-iter times over an
    # adaptive run is robust to those outliers, and the JSON records enough
    # to audit the number: per-iter spread, warmup time, iter count.
    t_w0 = time.perf_counter()
    float(fn(key, *rest))  # compile + first dispatch
    warmup_s = time.perf_counter() - t_w0
    # warm-cache precheck: one more iter; if it is far from the steady state
    # it still only costs its own slot in the median
    float(fn(jax.random.fold_in(key, 999), *rest))

    times = []
    budget_s = 150.0
    min_iters, max_iters = 10, 40
    t_bench0 = time.perf_counter()
    i = 0
    while True:
        t0 = time.perf_counter()
        float(fn(jax.random.fold_in(key, i), *rest))
        times.append(time.perf_counter() - t0)
        i += 1
        elapsed = time.perf_counter() - t_bench0
        if i >= max_iters:
            break
        if i >= min_iters and elapsed > budget_s:
            break
        # outlier retry protocol: once the distribution is demonstrably
        # tight, stop; if spread is still wide keep sampling (up to
        # max_iters / full budget) so transient stalls cannot dominate
        if i >= min_iters:
            med = float(np.median(times))
            spread = (np.percentile(times, 90) - np.percentile(times, 10)) / med
            if spread < 0.05:
                break
            if elapsed > budget_s / 2 and spread < 0.10:
                break

    arr = np.asarray(times)
    med = float(np.median(arr))
    ips = NIMG / med
    spread_pct = float(
        100.0 * (np.percentile(arr, 90) - np.percentile(arr, 10)) / med)

    print(json.dumps({
        "metric": "LOLv1 600x400 images/sec/chip @ K=16 two-stage Bayesian",
        "value": round(ips, 4),
        "unit": "images/sec",
        "vs_baseline": round(ips / BASELINE_PIPELINES_PER_SEC, 3),
        # the denominator is a DERIVED ESTIMATE (no published reference
        # throughput exists; see module docstring for the derivation from
        # the reference's one measured 0.31 s/train-iter log line)
        "baseline_is_estimate": True,
        "baseline_pipelines_per_sec_est": BASELINE_PIPELINES_PER_SEC,
        "scorer": cli.scorer,
        "iters": len(times),
        "iter_ms_median": round(1e3 * med, 1),
        "iter_ms_min": round(1e3 * float(arr.min()), 1),
        "spread_p10_p90_pct": round(spread_pct, 1),
        "warmup_s": round(warmup_s, 1),
        "warm": bool(warmup_s < 60.0),
    }))


if __name__ == "__main__":
    main()
