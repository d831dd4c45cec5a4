#!/bin/bash
# Round-3 TPU measurement queue: runs once the axon tunnel is back.
# Each step is timeboxed and logs to /tmp/tpu_queue/.
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

# 1. number of record first (cache-primed by this run for the driver)
run bench_default 3000 python bench.py
# 2. fresh device buckets
run trace_buckets 3000 python tools/trace_buckets.py
# 3. experiments
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
# 3b. attribution control: CF block interior off (round-2 path)
run bench_cf_off 3000 env BEM_BLOCK_CF=0 python bench.py
# 3c. LBLK sweep (round-2 leftover: compile service degraded mid-sweep)
run bench_lblk2048 3000 env BEM_SCAN_LBLK=2048 python bench.py
run bench_lblk512 3000 env BEM_SCAN_LBLK=512 python bench.py
# 4. train-iter vs reference 0.31 s
run train_iter 3000 python tools/train_iter_bench.py --arch DecompDualBranch2 \
  --trace /tmp/bem_trace_train
# 5. eval CLI with seeded CLIP bundle (driver config #4 path)
run eval_clip 3000 env BEM_CLIP_NPZ=/tmp/clip_iqa_seeded.npz python -m bem_tpu.enhancement.eval \
  --opt Options/CG_UNet_LOLv1.yml --cond_opt Options/IE_UNet_LOLv1.yml \
  --input_dir /tmp/eval_in --target_dir /tmp/eval_gt --num_samples 8 \
  --no_ref clip --result_dir /tmp/eval_out_clip
# 5b. sharded eval on the real chip (VERDICT r3 #5): K=16 NIQE selection
# through the shard_map path over the 1-device bayes mesh + axon transport
run eval_niqe_shard 3000 python -m bem_tpu.enhancement.eval \
  --opt Options/CG_UNet_LOLv1.yml --cond_opt Options/IE_UNet_LOLv1.yml \
  --input_dir /tmp/eval_in --target_dir /tmp/eval_gt --num_samples 16 \
  --no_ref niqe --shard_samples on --result_dir /tmp/eval_out_niqe_shard
# 5c. exported serving artifact on the chip (VERDICT r3 #6)
run export_onchip 3000 python tools/export_onchip.py
# 6. full-HD speed_test, both modes (VERDICT #6)
run speed_seq 3500 python -m bem_tpu.enhancement.speed_test \
  --opt Options/CG_UNet_LOLv1.yml --cond_opt Options/IE_UNet_LOLv1.yml \
  --input_size 2048 --repeat 20
run speed_batched 3500 python -m bem_tpu.enhancement.speed_test \
  --opt Options/CG_UNet_LOLv1.yml --cond_opt Options/IE_UNet_LOLv1.yml \
  --input_size 2048 --repeat 20 --speedup
echo "QUEUE DONE $(date)" | tee -a $OUT/queue.log
