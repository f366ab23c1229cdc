#!/bin/bash
# Block until the TPU worker answers a tiny matmul probe (post-crash heal).
cd /root/repo
for i in $(seq 1 40); do
  timeout 120 python - <<'EOF' 2>/dev/null && exit 0
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)) @ jnp.ones((128, 128))
assert float(x.sum()) == 128 * 128 * 128
print("tpu ok", flush=True)
EOF
  echo "probe $i failed; retrying in 90s" >&2
  sleep 90
done
exit 1
