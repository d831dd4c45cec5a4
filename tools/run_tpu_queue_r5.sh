#!/bin/bash
# Round-5 TPU measurement queue (VERDICT r4 items #4/#5/#6).
# Serialized: one process owns the chip at a time.
set -u
OUT=/tmp/tpu_queue_r5
mkdir -p $OUT
cd /root/repo

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a $OUT/queue.log
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $(tail -c 400 "$OUT/$name.log" | tr '\n' ' ')" | tee -a $OUT/queue.log
}

# --- VERDICT #5: eval-CLI steady-state serving latency (8 images) ---------
run eval_niqe 3000 python -m bem_tpu.enhancement.eval \
  --opt Options/CG_UNet_LOLv1.yml --cond_opt Options/IE_UNet_LOLv1.yml \
  --input_dir /tmp/eval_in --target_dir /tmp/eval_gt --num_samples 16 \
  --no_ref niqe --result_dir /tmp/eval_out_niqe_r5
run eval_niqe_shard 3000 python -m bem_tpu.enhancement.eval \
  --opt Options/CG_UNet_LOLv1.yml --cond_opt Options/IE_UNet_LOLv1.yml \
  --input_dir /tmp/eval_in --target_dir /tmp/eval_gt --num_samples 16 \
  --no_ref niqe --shard_samples on --result_dir /tmp/eval_out_niqes_r5
run eval_clip 3000 python -m bem_tpu.enhancement.eval \
  --opt Options/CG_UNet_LOLv1.yml --cond_opt Options/IE_UNet_LOLv1.yml \
  --input_dir /tmp/eval_in --target_dir /tmp/eval_gt --num_samples 16 \
  --no_ref clip --result_dir /tmp/eval_out_clip_r5

# --- VERDICT #6: protocol-exact full-HD speed_test (2048^2 x 100) ---------
run speed_seq100 3500 python -m bem_tpu.enhancement.speed_test \
  --opt Options/CG_UNet_LOLv1.yml --cond_opt Options/IE_UNet_LOLv1.yml \
  --input_size 2048 --repeat 100
run speed_batched100 3500 python -m bem_tpu.enhancement.speed_test \
  --opt Options/CG_UNet_LOLv1.yml --cond_opt Options/IE_UNet_LOLv1.yml \
  --input_size 2048 --repeat 100 --speedup

echo "QUEUE R5 DONE $(date)" | tee -a $OUT/queue.log
