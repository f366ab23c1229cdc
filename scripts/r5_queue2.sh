#!/bin/bash
# Round-5 follow-up TPU stages (run after r5_queue.sh; same stage protocol).
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
  probe || { echo "no healthy worker for $name"; return 1; }
  echo "=== stage $name: $(date) ===" | tee -a Results/r5/queue.log
  if "$@" > "Results/r5/$name.log" 2>&1; then
    touch "Results/r5/$name.done"
    echo "=== $name OK $(date) ===" | tee -a Results/r5/queue.log
  else
    echo "=== $name FAILED rc=$? $(date) ===" | tee -a Results/r5/queue.log
  fi
}

# Supervised structural probe: can the cost-volume decode FIT uniform pans
# at all (isolates architecture/gradient path from the unsupervised recipe)?
stage pan8_supervised python scripts/upflow_pan_supervised_probe.py 400 \
  rectangle2d_tex_pan8

# Lever probes: per-pair pan correlation of each lever checkpoint.
for lv in msd ssim occ eqoi; do
  stage "lever_${lv}_probe" env \
    UPFLOW_EXP_DIR="Results/rectangle2d_tex_pan8/upflow_lever_${lv}" \
    UPFLOW_GRAD_CLIP=1.0 \
    python scripts/probe_upflow_ckpt.py rectangle2d_tex_pan8 9
done

echo "r5 queue2 complete $(date)" | tee -a Results/r5/queue.log
