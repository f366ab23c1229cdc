"""Benchmark — RIFE IFNet-2D inference throughput at Droplet-2D resolution.

Protocol mirrors the reference's ``Flow-2D/benchmark/testtime.py:17-29`` (timed
``model.inference`` calls after warmup) adapted to the north-star metric in
BASELINE.json: Droplet-2D interpolated pairs/sec/chip (160x224 single-channel
frames, README.md:7).  Runs on whatever chip JAX exposes (TPU v5e under the
driver; falls back to CPU).

Measurement note: inputs are varied every call — the axon TPU relay caches
results for identical (fn, args) calls, which silently inflates naive loops.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}; the full
suite (3-D volumes, train step) is written to bench_details.json.
``vs_baseline`` is vs the reference GPU throughput estimate: the reference
publishes no inference number, so we use its only recorded throughput anchor —
UPFlow at ~1.23 it/s x batch 8 ≈ 9.8 pairs/sec (simple_train.py:56-59) — as a
conservative stand-in until a measured A100 RIFE number exists.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BATCH = 32
H, W = 160, 224
ITERS = 20
N_VARIANTS = 8  # distinct inputs cycled through the timing loop
REFERENCE_PAIRS_PER_SEC = 9.8  # UPFlow training anchor (simple_train.py:56-59)


def _timed(fn, make_variant, iters=ITERS):
    """Average seconds/call over ``iters`` never-repeated, fully-materialized calls.

    Two axon-relay traps (see CLAUDE.md): identical-input calls are cached, and
    execution is LAZY — unmaterialized results never run and block_until_ready
    does not force them.  So every call uses fresh inputs and its result is
    materialized to host before the next call.
    """
    import numpy as np

    warm = make_variant(-1)
    np.asarray(jax.tree.leaves(fn(*warm))[0])  # compile + warm + materialize
    variants = [make_variant(i) for i in range(iters)]
    for v in variants:
        jax.block_until_ready(v)
    t0 = time.perf_counter()
    for v in variants:
        np.asarray(jax.tree.leaves(fn(*v))[0])
    return (time.perf_counter() - t0) / iters


def bench_rife2d_inference():
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

    def make_variant(i):
        return (params, img0 + (i + 2) * 1e-4, img1 + (i + 2) * 1e-4)

    sec = _timed(forward, make_variant)
    return BATCH / sec


def bench_rife3d_inference(size=64, batch=4):
    from opticalflowscivis_tpu.models import ifnet_3d

    net = ifnet_3d(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    shape = (batch, size, size, size, 1)
    v0 = jax.random.uniform(key, shape, jnp.float32)
    v1 = jax.random.uniform(jax.random.fold_in(key, 1), shape, jnp.float32)
    params = jax.jit(net.init)(key, v0[:1, :32, :32, :32], v0[:1, :32, :32, :32], None)

    @jax.jit
    def forward(params, a, b):
        return net.apply(params, a, b, None)["merged"][-1]

    def make_variant(i):
        return (params, v0 + (i + 2) * 1e-4, v1 + (i + 2) * 1e-4)

    sec = _timed(forward, make_variant, iters=8)
    return batch / sec


def bench_train_step():
    import numpy as np

    from opticalflowscivis_tpu.data import group_tuples, rectangle_2d
    from opticalflowscivis_tpu.losses.rife import RIFELossWeights
    from opticalflowscivis_tpu.training import ModelConfig, TrainConfig, Trainer

    cfg = TrainConfig(
        dataset="rectangle2d", batch_size=64,
        model=ModelConfig(),
        loss=RIFELossWeights.preset_2d(flow_supervised=True),
        data_dir="/tmp/bench_data", log_dir="/tmp/bench_log",
        results_dir="/tmp/bench_res",
    )
    tr = Trainer(cfg)
    arr = rectangle_2d(n_frames=3 * 64 * 2, grid=(128, 128), box=(60, 80), seed=0)
    tuples = group_tuples(arr, 1).astype(np.float32)
    tr.init_state(tuples[:64], total_steps=100)

    def step(batch):
        tr.state, parts = tr._jit_train(tr.state, batch)
        return parts["loss_G"]

    def make_variant(i):
        sel = np.random.default_rng(i + 7).integers(0, tuples.shape[0], 64)
        return (jax.device_put(jnp.asarray(tuples[sel]), tr.batch_sharding),)

    sec = _timed(step, make_variant, iters=10)
    return 64 / sec


def main():
    pairs_per_sec = bench_rife2d_inference()
    details = {
        "rife2d_inference_160x224_pairs_per_sec": round(pairs_per_sec, 2),
    }
    try:
        details["rife3d_inference_64cube_vols_per_sec"] = round(
            bench_rife3d_inference(64), 3
        )
    except Exception as e:  # noqa: BLE001
        details["rife3d_inference_64cube_vols_per_sec"] = f"error: {e}"
    if jax.default_backend() == "tpu":  # 256^3 headline (slow on CPU)
        try:
            details["rife3d_inference_256cube_vols_per_sec"] = round(
                bench_rife3d_inference(256, batch=1), 3
            )
        except Exception as e:  # noqa: BLE001
            details["rife3d_inference_256cube_vols_per_sec"] = f"error: {e}"
    try:
        details["rife2d_train_128x128_pairs_per_sec"] = round(bench_train_step(), 2)
    except Exception as e:  # noqa: BLE001
        details["rife2d_train_128x128_pairs_per_sec"] = f"error: {e}"
    with open("bench_details.json", "w") as f:
        json.dump(details, f, indent=2)

    print(json.dumps({
        "metric": "rife2d_inference_droplet2d_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
