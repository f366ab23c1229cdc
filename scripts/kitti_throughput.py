"""Measured KITTI-multiview training throughput on the HBM-cache path.

VERDICT r2 item 7 asked for a measured steps/s at real KITTI resolution on
the TPU, batch 8, host stalls excluded by construction.  This builds a
synthetic multiview tree at KITTI-2015 frame size (375x1242, the reference's
`kitti_dataset.py` multiview layout), decodes it once into `KittiHBMCache`
(bf16, device-resident) and runs `UPFlowTrainer.fit_kitti_hbm` — per step
only pair indices + crop offsets + aug bits cross the host boundary.

Usage: python scripts/kitti_throughput.py [out.json] [--steps N]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_multiview(root: str, n_seq: int = 12, n_frames: int = 5,
                   size=(375, 1242)) -> str:
    import cv2

    d = os.path.join(root, "mv")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(3)
    for s in range(n_seq):
        base = rng.uniform(0, 255, size + (3,)).astype(np.uint8)
        for f in range(n_frames):
            img = np.roll(base, shift=3 * f, axis=1)
            cv2.imwrite(os.path.join(d, f"{s:06d}_{10 + f:02d}.png"), img)
    return d


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "Results/kitti_throughput.json"
    steps = 30
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    n_seq = 12  # 48 pairs (the r3 sizing); VERDICT r4 #6: --n_seq 250 gives
    #   1000 pairs, the KittiHBMCache CLI default, to validate decode time +
    #   HBM headroom + steady-state pairs/s at the shipped configuration
    if "--n_seq" in sys.argv:
        n_seq = int(sys.argv[sys.argv.index("--n_seq") + 1])

    from opticalflowscivis_tpu.data.kitti import KittiHBMCache
    from opticalflowscivis_tpu.training.upflow_trainer import (
        UPFlowTrainConfig,
        UPFlowTrainer,
    )

    with tempfile.TemporaryDirectory() as tmp:
        mv = make_multiview(tmp, n_seq=n_seq)
        t0 = time.time()
        cache = KittiHBMCache(mv, max_pairs=None)
        decode_s = time.time() - t0
        cfg = UPFlowTrainConfig(batch_size=8, exp_dir=os.path.join(tmp, "exp"),
                                n_data=1, hbm_dataset_gb=0.0)
        tr = UPFlowTrainer(cfg)
        # warm call compiles + uploads the cache; the second call reuses the
        # device-resident frames (fit_kitti_hbm caches them per trainer) so
        # the timed epoch is pure steady-state training (incl. the per-epoch
        # checkpoint + loss.json append, as in a real run).
        t0 = time.time()
        tr.fit_kitti_hbm(cache, steps_per_epoch=2, epochs=1, log_every=1)
        warm_s = time.time() - t0
        t0 = time.time()
        tr.fit_kitti_hbm(cache, steps_per_epoch=steps, epochs=1, log_every=10)
        sec = time.time() - t0
    res = {
        "frames": int(cache.frames.shape[0]),
        "frame_hw": list(cache.frames.shape[1:3]),
        "pairs": int(len(cache.pair_idx)),
        "crop": [256, 832],
        "batch": 8,
        "decode_s": round(decode_s, 2),
        "warmup_s_incl_compile_and_upload": round(warm_s, 2),
        "steps_timed": steps,
        "it_per_sec": round(steps / sec, 3),
        "pairs_per_sec": round(8 * steps / sec, 3),
        "vs_reference_anchor_9p8_pairs_per_sec": round(
            (8 * steps / sec) / 9.8, 3),
    }
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
