"""A-B the UPFlow train step's Pallas dispatch threshold on TPU.

Round-5 trace finding (Results/r5/trace_summary_r5.json): the b8 256x832
UPFlow train step spends ~0.4 of its 0.6 device-seconds around tiny
f32[16,4,13] async copies — VMEM staging for Mosaic kernels at the coarse
decode levels (4x13 .. 32x104), where the one-hot-matmul warp and the fused
cost volume cannot amortize their DMA/launch cost and XLA's plain gathers
are microseconds anyway.  This sweeps OFS_PALLAS_MIN_HW (both predicates:
ops/pallas/warp.py, ops/pallas/correlation.py) over the level boundaries of
the KITTI-protocol shapes, plus the all-jnp escape hatch, and records
seconds/step for each.

Levels of a 256x832 crop: 1/64=4x13 (52 px), 1/32=8x26 (208), 1/16=16x52
(832), 1/8=32x104 (3328), 1/4=64x208 (13312); loss warps run at 256x832
(212992).  Thresholds are set between those sizes.

Usage: python scripts/upflow_step_ab.py [out.json]
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

OUT = sys.argv[1] if len(sys.argv) > 1 else "Results/r5/upflow_step_ab.json"
BATCH = 8
ITERS = 12


def time_step(tag: str) -> dict:
    from opticalflowscivis_tpu.training.upflow_trainer import (
        UPFlowTrainConfig,
        UPFlowTrainer,
    )

    cfg = UPFlowTrainConfig(batch_size=BATCH, exp_dir="/tmp/ab_upflow",
                            n_data=1, hbm_dataset_gb=0.0)
    tr = UPFlowTrainer(cfg)
    key = jax.random.PRNGKey(0)
    pairs = np.asarray(
        jax.random.uniform(key, (BATCH, 2, 256, 832, 3), jnp.float32))
    tr.init_state(pairs)
    dev = jax.device_put(
        {"im1": jnp.asarray(pairs[:, 0]), "im2": jnp.asarray(pairs[:, 1])},
        tr.batch_sharding,
    )
    state, rng = tr.state, jax.random.PRNGKey(1)
    t_c0 = time.perf_counter()
    for i in range(2):  # compile + warm
        state, parts = tr._jit_train(state, dev, jax.random.fold_in(rng, i))
    loss0 = float(parts["loss_total"])
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, parts = tr._jit_train(
            state, dev, jax.random.fold_in(rng, 100 + i))
    loss1 = float(parts["loss_total"])  # materialize the chain
    sec = (time.perf_counter() - t0) / ITERS
    row = {"tag": tag, "sec_per_step": round(sec, 5),
           "pairs_per_sec": round(BATCH / sec, 2),
           "compile_s": round(compile_s, 1),
           "loss_warm": round(loss0, 5), "loss_end": round(loss1, 5)}
    print(json.dumps(row), flush=True)
    return row


def main():
    results = {"batch": BATCH, "iters": ITERS, "shape": [256, 832], "rows": []}
    for min_hw in (0, 256, 1024, 4096, 16384):
        os.environ["OFS_PALLAS_MIN_HW"] = str(min_hw)
        os.environ.pop("OFS_NO_PALLAS", None)
        results["rows"].append(time_step(f"min_hw={min_hw}"))
    os.environ["OFS_NO_PALLAS"] = "1"
    results["rows"].append(time_step("no_pallas"))
    os.environ.pop("OFS_NO_PALLAS", None)
    best = min(results["rows"], key=lambda r: r["sec_per_step"])
    results["best"] = best["tag"]
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print("best:", best, flush=True)


if __name__ == "__main__":
    main()
