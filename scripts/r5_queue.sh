#!/bin/bash
# Round-5 serialized TPU queue (ONE TPU job at a time — a crashed worker
# poisons co-running jobs).  Each stage probes TPU health first, logs to
# Results/r5/, and a failed stage does not block the rest.
# Stop the whole queue: touch /tmp/r5_stop
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
  probe || { echo "no healthy worker for $name"; return 1; }
  echo "=== stage $name: $(date) ===" | tee -a Results/r5/queue.log
  if "$@" > "Results/r5/$name.log" 2>&1; then
    touch "Results/r5/$name.done"
    echo "=== $name OK $(date) ===" | tee -a Results/r5/queue.log
  else
    echo "=== $name FAILED rc=$? $(date) ===" | tee -a Results/r5/queue.log
  fi
}

# 1) Structured ego-motion breakout candidate (VERDICT #1b): device-gen
#    multi-box pan, probe-validated basin.  30 epochs x 200 steps = 6K steps.
stage rects_pan python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangles2d_tex_pan8 --device_gen 1600 --batch_size 8 \
  --census_weight 1 --smooth1_weight 0.1 --lr 2e-4 --grad_clip 1.0 \
  --ckpt_every 10 --epochs 30

stage rects_pan_probe env UPFLOW_EXP_DIR=Results/rectangles2d_tex_pan8/upflow \
  UPFLOW_GRAD_CLIP=1.0 python scripts/probe_upflow_ckpt.py rectangles2d_tex_pan8 9

# 2) Untried reference recipe levers on pan8 (VERDICT #1c), 12 epochs each.
stage lever_msd python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex_pan8 --device_gen 1600 --batch_size 8 \
  --census_weight 1 --smooth1_weight 0.1 --msd_weight 1 --lr 2e-4 \
  --grad_clip 1.0 --ckpt_every 12 --epochs 12 --exp_name lever_msd

stage lever_ssim python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex_pan8 --device_gen 1600 --batch_size 8 \
  --census_weight 1 --smooth1_weight 0.1 --photo_loss_type SSIM --lr 2e-4 \
  --grad_clip 1.0 --ckpt_every 12 --epochs 12 --exp_name lever_ssim

stage lever_occ python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex_pan8 --device_gen 1600 --batch_size 8 \
  --census_weight 1 --smooth1_weight 0.1 --photo_use_occ --lr 2e-4 \
  --grad_clip 1.0 --ckpt_every 12 --epochs 12 --exp_name lever_occ

stage lever_eqoi python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex_pan8 --device_gen 1600 --batch_size 8 \
  --census_weight 1 --smooth1_weight 0.1 --recipe ex_runner --lr 2e-4 \
  --grad_clip 1.0 --ckpt_every 12 --epochs 12 --exp_name lever_eqoi

# 3) 256^3 hardening (VERDICT #3): 24 epochs, 32 val tuples, per-tuple spread.
stage train256 python scripts/train256.py --device_gen 16 --epochs 24 \
  --coarse_final --val_tuples 32 --out Results/r5/train256_r5

# 4) SGU suppresses-vs-delays (VERDICT #4): resume the SGU arm 44 -> 74.
stage sgu_resume python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex --census_weight 1 --smooth1_weight 0 --lr 2e-4 \
  --batch_size 32 --sgu --exp_name sgu --epochs 30 --resume

# 5) tex 0.5x bar (VERDICT #5): resume the base arm 60 -> 120.
stage tex_resume python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex --census_weight 1 --smooth1_weight 0 --lr 2e-4 \
  --batch_size 32 --epochs 60 --resume

# 6) skipped r3 items (VERDICT #6): coarse_final A-B at 64^3 ON TPU ...
stage ab64_base python scripts/train256.py --grid 64 --frames 40 --epochs 12 \
  --out Results/r5/ab64_base
stage ab64_coarse python scripts/train256.py --grid 64 --frames 40 --epochs 12 \
  --coarse_final --out Results/r5/ab64_coarse

# ... and KittiHBMCache at its 1000-pair default.
stage kitti1000 python scripts/kitti_throughput.py \
  Results/r5/kitti_throughput_1000.json --steps 30 --n_seq 250

echo "r5 queue complete $(date)" | tee -a Results/r5/queue.log
