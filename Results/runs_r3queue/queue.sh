#!/bin/bash
# Round-3 TPU job queue: one job at a time (relay discipline), global deadline
# so the TPU is free for the driver's end-of-round bench.
DEADLINE=$(date -u -d '2026-08-19 15:58' +%s)
LOG=/root/runs_r3queue
cd /root/repo
left() { echo $(( DEADLINE - $(date +%s) )); }

echo "queue start $(date -u), waiting for vfast eval chain (pid 21818)"
while kill -0 21818 2>/dev/null; do sleep 20; done
echo "chain done $(date -u), left=$(left)s"

run() {
  local name=$1; shift
  local budget=$1; shift
  local l=$(left)
  if [ "$l" -le 180 ]; then echo "SKIP $name (deadline, left=${l}s)"; return; fi
  [ "$budget" -gt "$l" ] && budget=$l
  echo "START $name budget=${budget}s $(date -u)"
  timeout --signal=TERM --kill-after=60 "$budget" "$@" > "$LOG/$name.log" 2>&1
  echo "END $name rc=$? $(date -u)"
}

run roofline 1400 python scripts/roofline.py Results/roofline.json
run distill64 1500 python -m opticalflowscivis_tpu.cli train \
    --dataset rectangle3d --distill 0.1 --epochs 40 \
    --results_dir Results/distill64
# unsupervised flow on the full-field-motion pan dataset (VERDICT r2 item 1):
# fixed 40-min slot, per-epoch ckpt+loss.json survive the timeout kill
run upflow_pan 2400 python -m opticalflowscivis_tpu.cli train_upflow \
    --dataset rectangle2d_tex_pan --census_weight 1 --smooth1_weight 0 \
    --lr 2e-4 --batch_size 32 --epochs 300 --results_dir Results
run train192 99999 python scripts/train256.py --grid 192 --frames 25 \
    --epochs 20 --out Results/train192
echo "QUEUE_DONE $(date -u)"
