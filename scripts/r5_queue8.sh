#!/bin/bash
# Round-5 tail: tight per-stage caps so every remaining VERDICT item gets a
# slice of the last ~35 min instead of one stage eating it.  Partial training
# progress survives via per-epoch checkpoints/loss.json.
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

stage() {
  name=$1; shift
  [ -f /tmp/r5_stop ] && exit 0
  [ -f "Results/r5/$name.done" ] && { echo "skip $name (done)"; return 0; }
  left=$(( DEADLINE - $(date +%s) ))
  [ "$left" -lt 240 ] && { echo "deadline: skip $name"; return 1; }
  probe || { echo "no healthy worker for $name"; return 1; }
  left=$(( DEADLINE - $(date +%s) ))
  [ "$left" -lt 240 ] && { echo "deadline: skip $name"; return 1; }
  cap=${CAP:-$left}
  [ "$cap" -gt "$left" ] && cap=$left
  echo "=== stage $name: $(date) (left ${left}s cap ${cap}s) ===" | tee -a Results/r5/queue.log
  if timeout -k 60 "$cap" "$@" > "Results/r5/$name.log" 2>&1; then
    touch "Results/r5/$name.done"
    echo "=== $name OK $(date) ===" | tee -a Results/r5/queue.log
  else
    echo "=== $name FAILED rc=$? $(date) ===" | tee -a Results/r5/queue.log
  fi
}

# SGU suppresses-vs-delays (VERDICT #4): resume 44 -> 74.
CAP=600 stage sgu_resume python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex --census_weight 1 --smooth1_weight 0 --lr 2e-4 \
  --batch_size 32 --sgu --exp_name sgu --epochs 30 --resume

# tex 0.5x bar (VERDICT #5): resume 60 -> 120.
CAP=600 stage tex_resume python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex --census_weight 1 --smooth1_weight 0 --lr 2e-4 \
  --batch_size 32 --epochs 60 --resume

# Supervised structural probe (decides architecture-vs-objective for the pan
# stall).
CAP=600 stage pan8_supervised python scripts/upflow_pan_supervised_probe.py 400 \
  rectangle2d_tex_pan8

# KittiHBMCache at the 1000-pair default (VERDICT #6b).
CAP=500 stage kitti1000 python scripts/kitti_throughput.py \
  Results/r5/kitti_throughput_1000.json --steps 30 --n_seq 250

# eq/oi lever (last of the four — weakest prior).
CAP=500 stage lever_eqoi python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex_pan8 --device_gen 1600 --batch_size 8 \
  --census_weight 1 --smooth1_weight 0.1 --recipe ex_runner --lr 2e-4 \
  --grad_clip 1.0 --ckpt_every 6 --epochs 12 --exp_name lever_eqoi
CAP=300 stage lever_eqoi_probe env \
  UPFLOW_EXP_DIR=Results/rectangle2d_tex_pan8/upflow_lever_eqoi \
  UPFLOW_GRAD_CLIP=1.0 python scripts/probe_upflow_ckpt.py rectangle2d_tex_pan8 9

# 64^3 coarse_final A-B on TPU (VERDICT #6a).
CAP=500 stage ab64_base python scripts/train256.py --grid 64 --frames 40 \
  --epochs 12 --out Results/r5/ab64_base
CAP=500 stage ab64_coarse python scripts/train256.py --grid 64 --frames 40 \
  --epochs 12 --coarse_final --out Results/r5/ab64_coarse

# 256^3 inference trace (north-star stand-in attribution).
CAP=500 stage trace_3d env TRACE_ONLY=rife3d \
  python scripts/trace_steps.py Results/r5/trace_3d_256.json

echo "r5 queue8 complete $(date)" | tee -a Results/r5/queue.log
