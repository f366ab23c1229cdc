#!/bin/bash
# Round-5 follow-up: stages that failed or were discovered mid-queue3.
# Same protocol (probe-guarded, deadline-bounded, .done skip).
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

# Pallas dispatch-threshold A-B at the KITTI 256x832 protocol (the import-path
# failure in queue3 is fixed; rects_pan already showed 1.18 -> 13 it/s at 128^2
# from the min_hw=1024 default — this quantifies the large-frame protocol).
stage upflow_ab python scripts/upflow_step_ab.py Results/r5/upflow_step_ab.json

# Post-fix trace pair for the UPFlow step (before/after evidence in
# Results/trace_summary.json, same protocol as the r4->r5 RIFE pair).
stage trace_upflow_postfix env TRACE_ONLY=upflow \
  python scripts/trace_steps.py Results/r5/trace_upflow_postfix.json

echo "r5 queue4 complete $(date)" | tee -a Results/r5/queue.log
