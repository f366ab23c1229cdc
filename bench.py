"""Benchmark — RIFE IFNet-2D inference throughput at Droplet-2D resolution.

Protocol mirrors the reference's ``Flow-2D/benchmark/testtime.py:17-29`` (100
timed ``model.inference`` calls after warmup) adapted to the north-star metric
in BASELINE.json: Droplet-2D interpolated pairs/sec/chip (160x224 single-channel
frames, README.md:7).  Runs on whatever chip JAX exposes (TPU v5e under the
driver; falls back to CPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is vs the reference GPU throughput estimate: the reference
publishes no inference number, so we use its only recorded throughput anchor —
UPFlow at ~1.23 it/s × batch 8 ≈ 9.8 pairs/sec (simple_train.py:56-59) — as a
conservative stand-in until a measured A100 RIFE number exists.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BATCH = 32
H, W = 160, 224
WARMUP = 10
ITERS = 50
REFERENCE_PAIRS_PER_SEC = 9.8  # UPFlow training anchor (simple_train.py:56-59)


def main():
    from opticalflowscivis_tpu.models import ifnet_2d

    net = ifnet_2d(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    img0 = jax.random.uniform(key, (BATCH, H, W, 1), jnp.float32)
    img1 = jax.random.uniform(jax.random.fold_in(key, 1), (BATCH, H, W, 1), jnp.float32)
    params = jax.jit(net.init)(key, img0, img1, None)

    @jax.jit
    def forward(params, img0, img1):
        out = net.apply(params, img0, img1, None)
        return out["merged"][-1]

    pred = forward(params, img0, img1)
    jax.block_until_ready(pred)
    for _ in range(WARMUP):
        pred = forward(params, img0, img1)
    jax.block_until_ready(pred)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        pred = forward(params, img0, img1)
    jax.block_until_ready(pred)
    dt = time.perf_counter() - t0

    pairs_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "rife2d_inference_droplet2d_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
