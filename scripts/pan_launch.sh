#!/bin/bash
# Supervised launcher for the long device-gen pan run.  The axon TPU worker
# can crash (kernel fault) and the relay then wedges for minutes; training
# checkpoints + appends loss.json every epoch, so the recovery loop is:
# probe until the worker answers, train with --resume, repeat on crash.
# A sentinel file stops the loop: touch /tmp/pan_stop
# Usage: pan_launch.sh [extra train_upflow args]
cd /root/repo
while [ ! -f /tmp/pan_stop ]; do
  probe_ok=0
  for i in $(seq 1 40); do
    [ -f /tmp/pan_stop ] && exit 0
    timeout 120 python - <<'EOF' && probe_ok=1 && break
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)) @ jnp.ones((128, 128))
assert float(x.sum()) == 128 * 128 * 128
print("tpu ok", flush=True)
EOF
    echo "probe $i failed; retrying in 120s" >&2
    sleep 120
  done
  [ -f /tmp/pan_stop ] && exit 0
  if [ "$probe_ok" != 1 ]; then
    # all probes failed: do NOT launch against a dead worker (ADVICE r4) —
    # a compile/crash cycle there costs ~35 min of relay wedge
    echo "all probes exhausted without a healthy worker; re-probing" >&2
    continue
  fi
  python -m opticalflowscivis_tpu.cli train_upflow \
    --dataset rectangle2d_tex_pan8 --device_gen 1600 --batch_size 8 \
    --census_weight 1 --smooth1_weight 0.1 --lr 2e-4 --grad_clip 1.0 \
    --ckpt_every 4 --resume "$@" && exit 0
  echo "train exited nonzero; probing and resuming" >&2
  sleep 60
done
