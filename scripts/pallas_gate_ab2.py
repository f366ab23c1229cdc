"""Per-op Pallas gate A-B: separate warp vs cost-volume thresholds, and check
the RIFE-2D step doesn't regress when its small model warps leave Pallas.

scripts/upflow_step_ab.py swept ONE global threshold on the UPFlow step and
found monotone improvement up to "no Pallas at all at the decode levels"
(13.26 -> 27.29 pairs/s, Results/r5/upflow_step_ab.json) — but it cannot say
whether the warp kernel, the cost-volume kernel, or both lose at the mid-size
planes (32x104, 64x208), and it says nothing about the RIFE-2D step whose
full-res (128^2) zeros-mode loss warps measured 6.5x FASTER on Pallas
(Results/trace_summary.json r4->r5 pair).  This times both steps under a
2x2 grid of per-op gates.

Usage: python scripts/pallas_gate_ab2.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "Results/r5/pallas_gate_ab2.json"
LOW, HIGH = "1024", "16384"


def time_upflow() -> dict:
    from opticalflowscivis_tpu.training.upflow_trainer import (
        UPFlowTrainConfig,
        UPFlowTrainer,
    )

    batch, iters = 8, 12
    cfg = UPFlowTrainConfig(batch_size=batch, exp_dir="/tmp/ab2_upflow",
                            n_data=1, hbm_dataset_gb=0.0)
    tr = UPFlowTrainer(cfg)
    pairs = np.asarray(jax.random.uniform(
        jax.random.PRNGKey(0), (batch, 2, 256, 832, 3), jnp.float32))
    tr.init_state(pairs)
    dev = jax.device_put(
        {"im1": jnp.asarray(pairs[:, 0]), "im2": jnp.asarray(pairs[:, 1])},
        tr.batch_sharding,
    )
    state, rng = tr.state, jax.random.PRNGKey(1)
    for i in range(2):
        state, parts = tr._jit_train(state, dev, jax.random.fold_in(rng, i))
    float(parts["loss_total"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, parts = tr._jit_train(
            state, dev, jax.random.fold_in(rng, 100 + i))
    float(parts["loss_total"])
    sec = (time.perf_counter() - t0) / iters
    return {"upflow_sec_per_step": round(sec, 5),
            "upflow_pairs_per_sec": round(batch / sec, 2)}


def time_rife2d() -> dict:
    from opticalflowscivis_tpu.data import group_tuples, rectangle_2d
    from opticalflowscivis_tpu.losses.rife import RIFELossWeights
    from opticalflowscivis_tpu.training import ModelConfig, TrainConfig, Trainer

    iters = 16
    cfg = TrainConfig(
        dataset="rectangle2d", batch_size=64, model=ModelConfig(),
        loss=RIFELossWeights.preset_2d(flow_supervised=True),
        data_dir="/tmp/ab2_data", log_dir="/tmp/ab2_log",
        results_dir="/tmp/ab2_res",
    )
    tr = Trainer(cfg)
    arr = rectangle_2d(n_frames=3 * 64, grid=(128, 128), box=(60, 80), seed=0)
    tuples = group_tuples(arr, 1).astype(np.float32)
    tr.init_state(tuples[:64], total_steps=100)
    batch = jax.device_put(jnp.asarray(tuples[:64]), tr.batch_sharding)
    state = tr.state
    for _ in range(2):
        state, parts = tr._jit_train(state, batch)
    float(parts["loss_G"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, parts = tr._jit_train(state, batch)
    float(parts["loss_G"])
    sec = (time.perf_counter() - t0) / iters
    return {"rife2d_sec_per_step": round(sec, 5),
            "rife2d_pairs_per_sec": round(64 / sec, 2)}


def main():
    results = {"rows": []}
    for warp_gate, corr_gate in ((LOW, LOW), (LOW, HIGH), (HIGH, LOW),
                                 (HIGH, HIGH)):
        os.environ["OFS_PALLAS_WARP_MIN_HW"] = warp_gate
        os.environ["OFS_PALLAS_CORR_MIN_HW"] = corr_gate
        row = {"warp_min_hw": int(warp_gate), "corr_min_hw": int(corr_gate)}
        row.update(time_upflow())
        row.update(time_rife2d())
        print(json.dumps(row), flush=True)
        results["rows"].append(row)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
