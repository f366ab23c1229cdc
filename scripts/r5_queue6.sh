#!/bin/bash
# Round-5: per-op Pallas gate A-B (warp vs corr, UPFlow + RIFE-2D), then
# resume the remaining queue5 stages (they self-skip via .done files).
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

name=gate_ab2
if [ ! -f "Results/r5/$name.done" ]; then
  left=$(( DEADLINE - $(date +%s) ))
  if [ "$left" -ge 300 ] && probe; then
    cap=$(( left < 1800 ? left : 1800 ))
    echo "=== stage $name: $(date) (left ${left}s cap ${cap}s) ===" | tee -a Results/r5/queue.log
    if timeout -k 60 "$cap" python scripts/pallas_gate_ab2.py \
        Results/r5/pallas_gate_ab2.json > "Results/r5/$name.log" 2>&1; then
      touch "Results/r5/$name.done"
      echo "=== $name OK $(date) ===" | tee -a Results/r5/queue.log
    else
      echo "=== $name FAILED rc=$? $(date) ===" | tee -a Results/r5/queue.log
    fi
  fi
fi

exec bash scripts/r5_queue5.sh
