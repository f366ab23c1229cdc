#!/bin/bash
# Round-5 final TPU queue: everything left after train256, ordered by value
# under the wall deadline.  The msd lever showed the FIRST nonzero pan
# correlation of any unsupervised run (corr_x 0.298 at 12 epochs,
# Results/r5/lever_msd_probe.log) so its long run comes right after the
# perf A-B; sgu/tex resumes run last and absorb whatever time remains
# (ckpt_every=1 keeps their progress on disk when the deadline kills them).
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

# 1) Pallas dispatch-threshold A-B at the KITTI 256x832 protocol.
stage upflow_ab python scripts/upflow_step_ab.py Results/r5/upflow_step_ab.json

# 2) msd lever long run: resume 12 -> 60 epochs on pan8 (first nonzero pan
#    correlation; does it break out with schedule?).
stage lever_msd_long python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex_pan8 --device_gen 1600 --batch_size 8 \
  --census_weight 1 --smooth1_weight 0.1 --msd_weight 1 --lr 2e-4 \
  --grad_clip 1.0 --ckpt_every 6 --epochs 60 --exp_name lever_msd --resume
stage lever_msd_long_probe env \
  UPFLOW_EXP_DIR=Results/rectangle2d_tex_pan8/upflow_lever_msd \
  UPFLOW_GRAD_CLIP=1.0 python scripts/probe_upflow_ckpt.py rectangle2d_tex_pan8 9

# 3) Post-fix trace pair for the UPFlow step.
stage trace_upflow_postfix env TRACE_ONLY=upflow \
  python scripts/trace_steps.py Results/r5/trace_upflow_postfix.json

# 4) Remaining untried levers (VERDICT #1c).
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

# 6) skipped r3 items (VERDICT #6): coarse_final A-B at 64^3 ON TPU + the
#    1000-pair KittiHBMCache configuration.
stage ab64_base python scripts/train256.py --grid 64 --frames 40 --epochs 12 \
  --out Results/r5/ab64_base
stage ab64_coarse python scripts/train256.py --grid 64 --frames 40 --epochs 12 \
  --coarse_final --out Results/r5/ab64_coarse
stage kitti1000 python scripts/kitti_throughput.py \
  Results/r5/kitti_throughput_1000.json --steps 30 --n_seq 250

# 6b) First-ever trace of the 256^3 inference north-star stand-in.
stage trace_3d env TRACE_ONLY=rife3d \
  python scripts/trace_steps.py Results/r5/trace_3d_256.json

# 7) Long resumes absorb the remaining wall (VERDICT #4, #5).
stage sgu_resume python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex --census_weight 1 --smooth1_weight 0 --lr 2e-4 \
  --batch_size 32 --sgu --exp_name sgu --epochs 30 --resume
stage tex_resume python -m opticalflowscivis_tpu.cli train_upflow \
  --dataset rectangle2d_tex --census_weight 1 --smooth1_weight 0 --lr 2e-4 \
  --batch_size 32 --epochs 60 --resume

echo "r5 queue5 complete $(date)" | tee -a Results/r5/queue.log
