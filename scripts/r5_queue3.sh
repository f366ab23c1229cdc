#!/bin/bash
# Round-5 queue, reordered after the UPFlow tiny-level Pallas finding
# (Results/r5/trace_summary_r5.json): the dispatch-threshold A-B runs FIRST so
# every later UPFlow stage inherits the measured-fastest default.  Same stage
# protocol as r5_queue.sh (ONE TPU job at a time; probe-guarded; .done files
# skip completed stages).  Stop everything: touch /tmp/r5_stop
#
# DEADLINE: no stage starts after it and running stages are timeout-killed at
# it, so the TPU is idle for the driver's end-of-round bench run.
DEADLINE=${R5_DEADLINE:-1787337700}
cd /root/repo
mkdir -p Results/r5

probe() {
  for i in $(seq 1 30); do
    [ -f /tmp/r5_stop ] && exit 0
    timeout 120 python - <<'EOF' && return 0
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)) @ jnp.ones((128, 128))
assert float(x.sum()) == 128 * 128 * 128
EOF
    echo "probe $i failed; retry in 90s" >&2
    sleep 90
  done
  return 1
}

stage() {  # stage <name> <cmd...>
  name=$1; shift
  [ -f /tmp/r5_stop ] && exit 0
  [ -f "Results/r5/$name.done" ] && { echo "skip $name (done)"; return 0; }
  left=$(( DEADLINE - $(date +%s) ))
  [ "$left" -lt 300 ] && { echo "deadline: skip $name"; return 1; }
  probe || { echo "no healthy worker for $name"; return 1; }
  left=$(( DEADLINE - $(date +%s) ))
  [ "$left" -lt 300 ] && { echo "deadline: skip $name"; return 1; }
  echo "=== stage $name: $(date) (left ${left}s) ===" | tee -a Results/r5/queue.log
  if timeout -k 60 "$left" "$@" > "Results/r5/$name.log" 2>&1; then
    touch "Results/r5/$name.done"
    echo "=== $name OK $(date) ===" | tee -a Results/r5/queue.log
  else
    echo "=== $name FAILED rc=$? $(date) ===" | tee -a Results/r5/queue.log
  fi
}

# 0) Pallas dispatch-threshold A-B on the UPFlow step (round-5 trace finding).
stage upflow_ab python scripts/upflow_step_ab.py Results/r5/upflow_step_ab.json

# 1) Structured ego-motion breakout candidate (VERDICT #1b) — resumes the
#    STOP-interrupted run from r5_queue.sh.
stage rects_pan python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangles2d_tex_pan8 --device_gen 1600 --batch_size 8 \
  --census_weight 1 --smooth1_weight 0.1 --lr 2e-4 --grad_clip 1.0 \
  --ckpt_every 5 --epochs 30 --resume

stage rects_pan_probe env UPFLOW_EXP_DIR=Results/rectangles2d_tex_pan8/upflow \
  UPFLOW_GRAD_CLIP=1.0 python scripts/probe_upflow_ckpt.py rectangles2d_tex_pan8 9

# 2) msd lever — the one the landscape probe directly motivates (VERDICT #1c).
stage lever_msd python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex_pan8 --device_gen 1600 --batch_size 8 \
  --census_weight 1 --smooth1_weight 0.1 --msd_weight 1 --lr 2e-4 \
  --grad_clip 1.0 --ckpt_every 6 --epochs 12 --exp_name lever_msd
stage lever_msd_probe env \
  UPFLOW_EXP_DIR=Results/rectangle2d_tex_pan8/upflow_lever_msd \
  UPFLOW_GRAD_CLIP=1.0 python scripts/probe_upflow_ckpt.py rectangle2d_tex_pan8 9

# 3) 256^3 hardening (VERDICT #3): 24 epochs, 32 val tuples, per-tuple spread.
stage train256 python scripts/train256.py --device_gen 16 --epochs 24 \
  --coarse_final --val_tuples 32 --out Results/r5/train256_r5

# 4) Remaining untried levers on pan8 (VERDICT #1c).
stage lever_ssim python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex_pan8 --device_gen 1600 --batch_size 8 \
  --census_weight 1 --smooth1_weight 0.1 --photo_loss_type SSIM --lr 2e-4 \
  --grad_clip 1.0 --ckpt_every 6 --epochs 12 --exp_name lever_ssim
stage lever_ssim_probe env \
  UPFLOW_EXP_DIR=Results/rectangle2d_tex_pan8/upflow_lever_ssim \
  UPFLOW_GRAD_CLIP=1.0 python scripts/probe_upflow_ckpt.py rectangle2d_tex_pan8 9

stage lever_occ python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex_pan8 --device_gen 1600 --batch_size 8 \
  --census_weight 1 --smooth1_weight 0.1 --photo_use_occ --lr 2e-4 \
  --grad_clip 1.0 --ckpt_every 6 --epochs 12 --exp_name lever_occ
stage lever_occ_probe env \
  UPFLOW_EXP_DIR=Results/rectangle2d_tex_pan8/upflow_lever_occ \
  UPFLOW_GRAD_CLIP=1.0 python scripts/probe_upflow_ckpt.py rectangle2d_tex_pan8 9

stage lever_eqoi python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex_pan8 --device_gen 1600 --batch_size 8 \
  --census_weight 1 --smooth1_weight 0.1 --recipe ex_runner --lr 2e-4 \
  --grad_clip 1.0 --ckpt_every 6 --epochs 12 --exp_name lever_eqoi
stage lever_eqoi_probe env \
  UPFLOW_EXP_DIR=Results/rectangle2d_tex_pan8/upflow_lever_eqoi \
  UPFLOW_GRAD_CLIP=1.0 python scripts/probe_upflow_ckpt.py rectangle2d_tex_pan8 9

# 5) Supervised structural probe: can the decode FIT uniform pans at all?
stage pan8_supervised python scripts/upflow_pan_supervised_probe.py 400 \
  rectangle2d_tex_pan8

# 6) SGU suppresses-vs-delays (VERDICT #4): resume the SGU arm 44 -> 74.
stage sgu_resume python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex --census_weight 1 --smooth1_weight 0 --lr 2e-4 \
  --batch_size 32 --sgu --exp_name sgu --epochs 30 --resume

# 7) tex 0.5x bar (VERDICT #5): resume the base arm 60 -> 120.
stage tex_resume python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex --census_weight 1 --smooth1_weight 0 --lr 2e-4 \
  --batch_size 32 --epochs 60 --resume

# 8) skipped r3 items (VERDICT #6): coarse_final A-B at 64^3 ON TPU ...
stage ab64_base python scripts/train256.py --grid 64 --frames 40 --epochs 12 \
  --out Results/r5/ab64_base
stage ab64_coarse python scripts/train256.py --grid 64 --frames 40 --epochs 12 \
  --coarse_final --out Results/r5/ab64_coarse

# ... and KittiHBMCache at its 1000-pair default.
stage kitti1000 python scripts/kitti_throughput.py \
  Results/r5/kitti_throughput_1000.json --steps 30 --n_seq 250

echo "r5 queue3 complete $(date)" | tee -a Results/r5/queue.log
