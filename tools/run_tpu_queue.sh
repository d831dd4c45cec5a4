#!/bin/bash
# Round-4 TPU measurement queue: runs once the axon tunnel is back.
# Each step is timeboxed and logs to /tmp/tpu_queue/.
# Ordered so the NUMBERS OF RECORD land first (a late tunnel recovery must
# still produce bench + train-iter + traces before the round closes),
# then the cheap product-path runs, then experiments, then the
# compile-heavy full-HD speed tests.
set -u
OUT=/tmp/tpu_queue
mkdir -p $OUT
cd /root/repo

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a $OUT/queue.log
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $(tail -c 300 "$OUT/$name.log" | tr '\n' ' ')" | tee -a $OUT/queue.log
}

# --- numbers of record --------------------------------------------------
# 1. serving throughput at HEAD (also primes the compile cache for the
#    driver's BENCH capture)
run bench_default 3000 python bench.py
# 2. fresh device buckets for the serving pipeline
run trace_buckets 3000 python tools/trace_buckets.py
# 3. train-iter vs reference 0.31 s, with train-side buckets
run train_iter 3000 python tools/train_iter_bench.py --arch DecompDualBranch2 \
  --trace /tmp/bem_trace_train

# --- product paths on the chip -------------------------------------------
# 4. eval CLI with seeded CLIP bundle (driver config #4 path)
run eval_clip 3000 env BEM_CLIP_NPZ=/tmp/clip_iqa_seeded.npz python -m bem_tpu.enhancement.eval \
  --opt Options/CG_UNet_LOLv1.yml --cond_opt Options/IE_UNet_LOLv1.yml \
  --input_dir /tmp/eval_in --target_dir /tmp/eval_gt --num_samples 8 \
  --no_ref clip --result_dir /tmp/eval_out_clip
# 4b. sharded eval on the real chip (VERDICT r3 #5): K=16 NIQE selection
# through the shard_map path over the 1-device bayes mesh + axon transport
run eval_niqe_shard 3000 python -m bem_tpu.enhancement.eval \
  --opt Options/CG_UNet_LOLv1.yml --cond_opt Options/IE_UNet_LOLv1.yml \
  --input_dir /tmp/eval_in --target_dir /tmp/eval_gt --num_samples 16 \
  --no_ref niqe --shard_samples on --result_dir /tmp/eval_out_niqe_shard
# 4c. exported serving artifact on the chip (VERDICT r3 #6)
run export_onchip 3000 python tools/export_onchip.py

# --- experiments ----------------------------------------------------------
run bench_mxu_cumsum 3000 env BEM_SCAN_MXU_CUMSUM=1 python bench.py
run bench_cg_xla 3000 env BEM_BENCH_CG_BACKEND=xla python bench.py
run bench_nimg3 3000 python -c "
import sys; sys.path.insert(0, '.')
import time, numpy as np, jax
from bench import build_pipeline
fn, (key, img, cond) = build_pipeline(3)
float(fn(key, img, cond))
ts = []
for i in range(12):
    t0 = time.perf_counter(); float(fn(jax.random.fold_in(key, i), img, cond)); ts.append(time.perf_counter() - t0)
med = float(np.median(ts)); print('NIMG=3', round(3/med, 3), 'img/s iter_ms', round(1e3*med, 1))"
# attribution control: CF block interior off (round-2 path)
run bench_cf_off 3000 env BEM_BLOCK_CF=0 python bench.py
# LBLK sweep (round-2 leftover: compile service degraded mid-sweep)
run bench_lblk2048 3000 env BEM_SCAN_LBLK=2048 python bench.py
run bench_lblk512 3000 env BEM_SCAN_LBLK=512 python bench.py

# --- compile-heavy tail ---------------------------------------------------
# full-HD speed_test, both modes (VERDICT r2 #6)
run speed_seq 3500 python -m bem_tpu.enhancement.speed_test \
  --opt Options/CG_UNet_LOLv1.yml --cond_opt Options/IE_UNet_LOLv1.yml \
  --input_size 2048 --repeat 20
run speed_batched 3500 python -m bem_tpu.enhancement.speed_test \
  --opt Options/CG_UNet_LOLv1.yml --cond_opt Options/IE_UNet_LOLv1.yml \
  --input_size 2048 --repeat 20 --speedup
echo "QUEUE DONE $(date)" | tee -a $OUT/queue.log
