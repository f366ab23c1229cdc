#!/bin/bash
# Round-4 post-pan TPU queue: run after the pan training stops (STOP
# sentinel).  One TPU job at a time; each step probes the relay first.
# Usage: r4_queue.sh  (logs under Results/runs_r4queue/)
cd /root/repo
mkdir -p Results/runs_r4queue

probe() { bash scripts/tpu_probe_wait.sh; }

# 1. regenerate the trace summary lost with session 1 (VERDICT r3 item 6)
probe && timeout 1800 python scripts/trace_steps.py \
  > Results/runs_r4queue/trace_steps.log 2>&1
echo "=== trace_steps done rc=$? $(date)" >> Results/runs_r4queue/queue.log

# 2. 256^3 device-gen learning run (VERDICT item 2)
probe && timeout 7200 python scripts/train256.py --device_gen 16 --epochs 12 \
  --out Results/train256_devgen_r4 \
  > Results/runs_r4queue/train256_devgen.log 2>&1
echo "=== train256 done rc=$? $(date)" >> Results/runs_r4queue/queue.log

# 3. SGU training A-B on rectangle2d_tex (VERDICT item 3b) — the base arm is
# the committed round-3 run (Results/rectangle2d_tex/upflow/loss.json)
probe && timeout 5400 python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex --census_weight 1 --smooth1_weight 0 \
  --lr 2e-4 --batch_size 32 --epochs 40 --ckpt_every 5 \
  --sgu --exp_name sgu \
  > Results/runs_r4queue/sgu_ab.log 2>&1
echo "=== sgu A-B done rc=$? $(date)" >> Results/runs_r4queue/queue.log
