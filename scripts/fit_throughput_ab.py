"""A/B: the real UPFlow training hot loops at identical shapes, solo.

The r3 profile measured tr._jit_train at 1718 ms/step while fit_kitti_hbm
sustained ~670 ms/step at the same batch/resolution (b8 256x832); micro-bench
numbers through the relay proved untrustworthy (a forward-only jit "took" 2x
the full train step).  This drives the REAL training-loop patterns
back-to-back in one process:

  A  fit()'s hot loop:        _jit_train_idx on device-resident pairs,
                              fresh index array + fold_in rng per step,
                              device-side meter, materialize at the end
  A2 constant-batch loop:     _jit_train on one device-resident batch dict
                              (the r3 roofline/profile pattern)
  B  fit_kitti_hbm:           boundary-dilated losses, on-device crops/aug
                              (1 ckpt + loss.json append included, as a real
                              epoch has)

Usage: python scripts/fit_throughput_ab.py [out.json]
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

STEPS = 32


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "Results/fit_throughput_ab.json"
    import tempfile

    from opticalflowscivis_tpu.data.kitti import KittiHBMCache
    from opticalflowscivis_tpu.training.upflow_trainer import (
        UPFlowTrainConfig,
        UPFlowTrainer,
    )

    res = {"steps": STEPS, "batch": 8, "hw": [256, 832]}
    rng_np = np.random.default_rng(0)

    def report(name, sec):
        res[name + "_s_per_step"] = round(sec, 4)
        res[name + "_pairs_per_sec"] = round(8 / sec, 3)
        print(f"{name}: {sec*1e3:.1f} ms/step = {8/sec:.2f} pairs/s",
              flush=True)

    # --- A: fit()'s hot loop (HBM-resident pairs, index gather per step).
    # 8 bf16 pairs (~20 MB): the relay's ~2 MB/s bulk H2D makes larger pools
    # minutes of upload; the loop's work is size-independent of the pool.
    def note(msg):
        print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)

    pairs = rng_np.uniform(0, 1, (8, 2, 256, 832, 3)).astype(np.float32)
    note("A: trainer init + upload")
    cfg = UPFlowTrainConfig(batch_size=8, exp_dir="/tmp/ab_fit", n_data=1)
    tr = UPFlowTrainer(cfg)
    tr.init_state(pairs[:1])
    data_dev = jax.device_put(jnp.asarray(pairs, jnp.bfloat16), tr.repl)
    root = jax.random.PRNGKey(1)

    def run_idx(n, ofs):
        state = tr.state
        meter = None
        for i in range(n):
            idx = rng_np.integers(0, pairs.shape[0], size=8)
            state, parts = tr._jit_train_idx(
                state, data_dev, jnp.asarray(idx),
                jax.random.fold_in(root, ofs + i))
            meter = parts if meter is None else jax.tree.map(
                jnp.add, meter, parts)
        f = float(meter["loss_total"])
        tr.state = state
        return f

    note("A: compile/warm _jit_train_idx")
    run_idx(2, 0)  # warm/compile
    note("A: timed loop")
    t0 = time.time()
    run_idx(STEPS, 2)
    report("A_fit_idx_loop", (time.time() - t0) / STEPS)

    # --- A2: constant-batch _jit_train loop (the r3 roofline/profile pattern)
    batch_dev = jax.device_put(
        {"im1": jnp.asarray(pairs[:8, 0]), "im2": jnp.asarray(pairs[:8, 1])},
        tr.batch_sharding)

    def run_const(n, ofs):
        state = tr.state
        meter = None
        for i in range(n):
            state, parts = tr._jit_train(
                state, batch_dev, jax.random.fold_in(root, 1000 + ofs + i))
            meter = parts if meter is None else jax.tree.map(
                jnp.add, meter, parts)
        f = float(meter["loss_total"])
        tr.state = state
        return f

    note("A2: compile/warm _jit_train")
    run_const(2, 0)
    note("A2: timed loop")
    t0 = time.time()
    run_const(STEPS, 2)
    report("A2_const_batch_loop", (time.time() - t0) / STEPS)

    # --- B: fit_kitti_hbm (boundary losses; includes 1 ckpt + loss.json)
    import cv2

    with tempfile.TemporaryDirectory() as tmp:
        d = os.path.join(tmp, "mv")
        os.makedirs(d)
        for s in range(12):
            base = rng_np.uniform(0, 255, (375, 1242, 3)).astype(np.uint8)
            for f in range(5):
                cv2.imwrite(os.path.join(d, f"{s:06d}_{10+f:02d}.png"),
                            np.roll(base, 3 * f, axis=1))
        note("B: building KittiHBMCache (decode + upload)")
        cache = KittiHBMCache(d, max_pairs=None)
        cfg2 = UPFlowTrainConfig(batch_size=8, exp_dir="/tmp/ab_hbm", n_data=1,
                                 hbm_dataset_gb=0.0)
        tr2 = UPFlowTrainer(cfg2)
        note("B: compile/warm fit_kitti_hbm")
        tr2.fit_kitti_hbm(cache, steps_per_epoch=2, epochs=1, log_every=0)
        note("B: timed epoch")
        t0 = time.time()
        tr2.fit_kitti_hbm(cache, steps_per_epoch=STEPS, epochs=1, log_every=0)
        report("B_fit_kitti_hbm", (time.time() - t0) / STEPS)

    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
