#!/bin/bash
# Round-5 queue, part B: after-fast-path eval latency + strict train-iter.
set -u
OUT=/tmp/tpu_queue_r5
mkdir -p $OUT
cd /root/repo

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a $OUT/queue.log
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $(tail -c 400 "$OUT/$name.log" | tr '\n' ' ')" | tee -a $OUT/queue.log
}

# strict train-iter with reference-parity overlapped upload (VERDICT #4)
run train_iter_strict 3000 python tools/train_iter_bench.py \
  --arch DecompDualBranch2 --iters 30

# eval latency AFTER the on-device-selection fast path (VERDICT #5)
run eval_niqe_fast 3000 python -m bem_tpu.enhancement.eval \
  --opt Options/CG_UNet_LOLv1.yml --cond_opt Options/IE_UNet_LOLv1.yml \
  --input_dir /tmp/eval_in --target_dir /tmp/eval_gt --num_samples 16 \
  --no_ref niqe --result_dir /tmp/eval_out_niqe_r5b
run eval_niqe_shard_fast 3000 python -m bem_tpu.enhancement.eval \
  --opt Options/CG_UNet_LOLv1.yml --cond_opt Options/IE_UNet_LOLv1.yml \
  --input_dir /tmp/eval_in --target_dir /tmp/eval_gt --num_samples 16 \
  --no_ref niqe --shard_samples on --result_dir /tmp/eval_out_niqes_r5b
run eval_clip_fast 3000 python -m bem_tpu.enhancement.eval \
  --opt Options/CG_UNet_LOLv1.yml --cond_opt Options/IE_UNet_LOLv1.yml \
  --input_dir /tmp/eval_in --target_dir /tmp/eval_gt --num_samples 16 \
  --no_ref clip --result_dir /tmp/eval_out_clip_r5b

# final: prime the compile cache for the driver's warm BENCH capture
# (VERDICT #2) — this MUST be the last chip job of the round
run bench_warm 3000 python bench.py

echo "QUEUE R5B DONE $(date)" | tee -a $OUT/queue.log
