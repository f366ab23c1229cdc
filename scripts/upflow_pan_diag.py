"""Recipe grid for the pan (full-field-motion) dataset.

The round-3 pan run (census=1, smooth1=0 — the recipe that unlocked
rectangle2d_tex) sits ABOVE the zero-flow baseline after 33 epochs
(val EPE 3.29 vs 2.99) with occ_fw_mean ~ 0.04: the flow escaped zero but is
fw/bw-incoherent noise.  Hypothesis: smooth1=0 was right for tex (whose only
motion is a box, and edge-aware smoothness taxed the box boundary) but wrong
for pan, where the optimum is a globally-smooth field — first-order
smoothness is free at the optimum and prunes the noisy minima census-only
training falls into.  Reference default: smooth_order_1_weight=1.0
(UPFlow/scripts/simple_train.py:136-155).

Overfits a fixed 4-pair batch (distinct pans, so the net must read the shift
from the cost volume, not memorize one) under a small recipe grid and reports
full-field EPE vs GT plus the pan-coherence of the prediction.

Usage: python scripts/upflow_pan_diag.py [steps]   (run on the TPU, solo)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from opticalflowscivis_tpu.data import get_spec, pad_to_multiple
from opticalflowscivis_tpu.data.registry import load_raw_series
from opticalflowscivis_tpu.losses.upflow import UPFlowLossConfig
from opticalflowscivis_tpu.training.upflow_trainer import (
    UPFlowTrainConfig, UPFlowTrainer, frames_to_pairs,
)

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 400
DATASET = sys.argv[2] if len(sys.argv) > 2 else "rectangle2d_tex_pan"
ONLY = sys.argv[3].split(",") if len(sys.argv) > 3 else None
REPORT = max(1, STEPS // 8)
B = 4


def pick_batch():
    """B val pairs with distinct, large pans, padded to /64."""
    spec = get_spec(DATASET)
    series = load_raw_series(DATASET, "data_cache", "val")
    k = min(len(series), 40)
    pairs = frames_to_pairs(series[:k, ..., :1], in_channels=3)
    gt = series[: k - 1, ..., 1 : 1 + spec.ndim] * spec.gt_flow_stride
    # rank pairs by pan magnitude, keep B with DISTINCT pan vectors (the
    # random walk holds its velocity over stretches)
    pans = [tuple(np.median(gt[t].reshape(-1, 2), axis=0)) for t in range(k - 1)]
    order = np.argsort([-abs(p[0]) - abs(p[1]) for p in pans])
    sel, seen = [], set()
    for t in order:
        if pans[t] not in seen:
            sel.append(int(t))
            seen.add(pans[t])
        if len(sel) == B:
            break
    sel = sorted(sel)
    batch_pairs, _ = pad_to_multiple(pairs[sel], 64, leading_axes=2)
    gt_sel = gt[sel]
    for i, t in enumerate(sel):
        pan = np.median(gt_sel[i].reshape(-1, 2), axis=0)
        print(f"pair {t}: pan ({pan[0]:+.1f},{pan[1]:+.1f}) "
              f"mean|gt| {np.abs(gt_sel[i]).mean():.2f}", flush=True)
    return batch_pairs, gt_sel


BATCH_PAIRS, GT = pick_batch()
H, W = GT.shape[1:3]

CONDS = [
    ("c1_s0_ctrl", {"loss": UPFlowLossConfig(census_weight=1.0,
                                             smooth_order_1_weight=0.0)}),
    ("c1_s1", {"loss": UPFlowLossConfig(census_weight=1.0,
                                        smooth_order_1_weight=1.0)}),
    ("c1_s0p1", {"loss": UPFlowLossConfig(census_weight=1.0,
                                          smooth_order_1_weight=0.1)}),
    ("photo_s1", {"loss": UPFlowLossConfig(census_weight=0.0,
                                           smooth_order_1_weight=1.0)}),
    ("c1_s1_lr1e-3", {"lr": 1e-3,
                      "loss": UPFlowLossConfig(census_weight=1.0,
                                               smooth_order_1_weight=1.0)}),
]


def run(name, kw):
    cfg = UPFlowTrainConfig(exp_dir=f"/tmp/pandiag_{name}", n_data=1,
                            batch_size=B, hbm_dataset_gb=0.0,
                            **({"lr": 2e-4} | kw))
    tr = UPFlowTrainer(cfg)
    tr.init_state(BATCH_PAIRS)
    batch = jax.device_put(
        {"im1": jnp.asarray(BATCH_PAIRS[:, 0]),
         "im2": jnp.asarray(BATCH_PAIRS[:, 1])},
        tr.batch_sharding)
    rng0 = jax.random.PRNGKey(7)
    t0 = time.time()
    for step in range(1, STEPS + 1):
        tr.state, parts = tr._jit_train(tr.state, batch,
                                        jax.random.fold_in(rng0, step))
        if step % REPORT == 0 or step == 1:
            _, extras = tr._jit_eval(tr.state, batch)
            flow = np.asarray(extras["flow_f"])[:, :H, :W]
            epe = float(np.linalg.norm(flow - GT, axis=-1).mean())
            epe0 = float(np.linalg.norm(GT, axis=-1).mean())
            # pan coherence: per-pair spatial std of the predicted field
            coh = float(np.mean(flow.reshape(B, -1, 2).std(axis=1)))
            print(f"{name} step {step}: census {float(parts['census_loss']):.3f} "
                  f"photo {float(parts['photo_loss']):.4f} "
                  f"smooth {float(parts['smooth_loss']):.4f} "
                  f"epe {epe:.3f} (zero {epe0:.3f}) flow_std {coh:.2f} "
                  f"occ {float(parts['occ_fw_mean']):.3f} "
                  f"({step/(time.time()-t0):.1f} it/s)", flush=True)
    del tr


for name, kw in CONDS:
    if ONLY and name not in ONLY:
        continue
    print(f"=== {name} ===", flush=True)
    run(name, kw)
print("DONE", flush=True)
