#!/bin/bash
# Round-5: harvest the wedge-killed 256^3 run (eval_only quality row from its
# last checkpoint — the relay wedges this program after ~35-40 min of
# stepping, twice now), then resume the remaining queue5 stages.
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

name=train256_eval
if [ ! -f "Results/r5/$name.done" ]; then
  left=$(( DEADLINE - $(date +%s) ))
  if [ "$left" -ge 300 ] && probe; then
    cap=$(( left < 1500 ? left : 1500 ))
    echo "=== stage $name: $(date) (left ${left}s cap ${cap}s) ===" | tee -a Results/r5/queue.log
    if timeout -k 60 "$cap" python scripts/train256.py --device_gen 16 \
        --epochs 24 --coarse_final --val_tuples 32 \
        --out Results/r5/train256_r5 --eval_only > "Results/r5/$name.log" 2>&1; then
      touch "Results/r5/$name.done"
      touch "Results/r5/train256_resume.done"  # harvested; don't re-train
      echo "=== $name OK $(date) ===" | tee -a Results/r5/queue.log
    else
      echo "=== $name FAILED rc=$? $(date) ===" | tee -a Results/r5/queue.log
    fi
  fi
fi

exec bash scripts/r5_queue5.sh
