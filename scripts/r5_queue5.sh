#!/bin/bash
# Round-5 final TPU queue: everything left after the train256 wedge, ordered
# by value under the wall deadline.  Stages are probe-guarded (worker heals
# take minutes after a crash), individually time-capped (CAP=seconds — a
# wedged relay call must not eat the whole budget; the 256^3 stall burned
# 35 min before being killed), and skippable via Results/r5/<name>.done.
# Stop everything: touch /tmp/r5_stop
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

stage() {  # [CAP=sec] stage <name> <cmd...>
  name=$1; shift
  [ -f /tmp/r5_stop ] && exit 0
  [ -f "Results/r5/$name.done" ] && { echo "skip $name (done)"; return 0; }
  left=$(( DEADLINE - $(date +%s) ))
  [ "$left" -lt 300 ] && { echo "deadline: skip $name"; return 1; }
  probe || { echo "no healthy worker for $name"; return 1; }
  left=$(( DEADLINE - $(date +%s) ))
  [ "$left" -lt 300 ] && { echo "deadline: skip $name"; return 1; }
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

# 1) Pallas dispatch-threshold A-B at the KITTI 256x832 protocol.
CAP=2700 stage upflow_ab python scripts/upflow_step_ab.py Results/r5/upflow_step_ab.json

# 2) msd lever long run: resume 12 -> 60 epochs on pan8 (first nonzero pan
#    correlation; does it break out with schedule?).
CAP=2700 stage lever_msd_long python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex_pan8 --device_gen 1600 --batch_size 8 \
  --census_weight 1 --smooth1_weight 0.1 --msd_weight 1 --lr 2e-4 \
  --grad_clip 1.0 --ckpt_every 6 --epochs 60 --exp_name lever_msd --resume
CAP=900 stage lever_msd_long_probe env \
  UPFLOW_EXP_DIR=Results/rectangle2d_tex_pan8/upflow_lever_msd \
  UPFLOW_GRAD_CLIP=1.0 python scripts/probe_upflow_ckpt.py rectangle2d_tex_pan8 9

# 3) 256^3 hardening, resumed from the epoch-8 checkpoint of the wedged run
#    (VERDICT #3; ckpt_every kept its progress).
CAP=3600 stage train256_resume python scripts/train256.py --device_gen 16 \
  --epochs 24 --coarse_final --val_tuples 32 --out Results/r5/train256_r5 --resume

# 4) Post-fix trace pair for the UPFlow step.
CAP=1500 stage trace_upflow_postfix env TRACE_ONLY=upflow \
  python scripts/trace_steps.py Results/r5/trace_upflow_postfix.json

# 5) Remaining untried levers (VERDICT #1c).
CAP=1800 stage lever_ssim python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex_pan8 --device_gen 1600 --batch_size 8 \
  --census_weight 1 --smooth1_weight 0.1 --photo_loss_type SSIM --lr 2e-4 \
  --grad_clip 1.0 --ckpt_every 6 --epochs 12 --exp_name lever_ssim
CAP=900 stage lever_ssim_probe env \
  UPFLOW_EXP_DIR=Results/rectangle2d_tex_pan8/upflow_lever_ssim \
  UPFLOW_GRAD_CLIP=1.0 python scripts/probe_upflow_ckpt.py rectangle2d_tex_pan8 9

CAP=1800 stage lever_occ python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex_pan8 --device_gen 1600 --batch_size 8 \
  --census_weight 1 --smooth1_weight 0.1 --photo_use_occ --lr 2e-4 \
  --grad_clip 1.0 --ckpt_every 6 --epochs 12 --exp_name lever_occ
CAP=900 stage lever_occ_probe env \
  UPFLOW_EXP_DIR=Results/rectangle2d_tex_pan8/upflow_lever_occ \
  UPFLOW_GRAD_CLIP=1.0 python scripts/probe_upflow_ckpt.py rectangle2d_tex_pan8 9

CAP=1800 stage lever_eqoi python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex_pan8 --device_gen 1600 --batch_size 8 \
  --census_weight 1 --smooth1_weight 0.1 --recipe ex_runner --lr 2e-4 \
  --grad_clip 1.0 --ckpt_every 6 --epochs 12 --exp_name lever_eqoi
CAP=900 stage lever_eqoi_probe env \
  UPFLOW_EXP_DIR=Results/rectangle2d_tex_pan8/upflow_lever_eqoi \
  UPFLOW_GRAD_CLIP=1.0 python scripts/probe_upflow_ckpt.py rectangle2d_tex_pan8 9

# 6) Long resumes (VERDICT #4, #5) — should be ~10x faster post-gate.
CAP=2400 stage sgu_resume python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex --census_weight 1 --smooth1_weight 0 --lr 2e-4 \
  --batch_size 32 --sgu --exp_name sgu --epochs 30 --resume
CAP=2400 stage tex_resume python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex --census_weight 1 --smooth1_weight 0 --lr 2e-4 \
  --batch_size 32 --epochs 60 --resume

# 7) skipped r3 items (VERDICT #6) + traces.
CAP=1500 stage ab64_base python scripts/train256.py --grid 64 --frames 40 \
  --epochs 12 --out Results/r5/ab64_base
CAP=1500 stage ab64_coarse python scripts/train256.py --grid 64 --frames 40 \
  --epochs 12 --coarse_final --out Results/r5/ab64_coarse
CAP=1200 stage kitti1000 python scripts/kitti_throughput.py \
  Results/r5/kitti_throughput_1000.json --steps 30 --n_seq 250
CAP=1500 stage trace_3d env TRACE_ONLY=rife3d \
  python scripts/trace_steps.py Results/r5/trace_3d_256.json

# 8) Supervised structural probe (diagnostic for the pan stall).
CAP=1500 stage pan8_supervised python scripts/upflow_pan_supervised_probe.py 400 \
  rectangle2d_tex_pan8

echo "r5 queue5 complete $(date)" | tee -a Results/r5/queue.log
