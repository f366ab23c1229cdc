"""VERDICT r2 protocol (a): overfit ONE known-motion pair with the FULL
UPFlow model under a grid of recipe x dataset conditions, on the TPU.

The 37K-step long run on rectangle2d_tex collapsed to |flow| ~ 6e-4 within one
epoch and froze (photo loss pinned at the zero-flow value 0.4598 for 134
epochs).  Working hypothesis: the *static per-pixel-textured background* (98%
of pixels) is a reinforced zero-flow attractor — abs_robust's gradient is
singular at zero diff (d(|d|+.01)^.4 ∝ |d|^-0.6), so any flow perturbation on
the perfectly-matched background is punished ~40x harder per pixel than the
moving box rewards.  KITTI (the reference's demonstrated case,
UPFlow/scripts/simple_train.py:56-59) has no static region: the whole image
moves.  The grid therefore crosses loss recipes with a whole-field-motion
dataset (vortex2d_fast LBS wake):

- if NO condition converges on either dataset -> structural bug (gradient path);
- if rect conditions freeze but vortex converges -> dataset property, and the
  long run should train on whole-field-motion data;
- if census/lr unlocks rect -> training recipe.

Usage: python scripts/upflow_overfit_diag.py [steps]
Writes one line per (condition, checkpoint-step) to stdout; run under nohup.
"""
import dataclasses
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
REPORT = max(1, STEPS // 8)


def pick_pair(dataset: str, cache: str):
    """Largest-|GT| consecutive pair of the val split, padded to /64."""
    spec = get_spec(dataset)
    series = load_raw_series(dataset, cache, "val")
    k = min(len(series), 12)
    pairs = frames_to_pairs(series[:k, ..., :1], in_channels=3)
    gt = series[: k - 1, ..., 1 : 1 + spec.ndim] * spec.gt_flow_stride
    disp = [float(np.abs(gt[t]).mean()) for t in range(k - 1)]
    t_sel = int(np.argmax(disp))
    one_pair, _ = pad_to_multiple(pairs[t_sel : t_sel + 1], 64, leading_axes=2)
    gt_sel = gt[t_sel : t_sel + 1]
    # region of interest = where GT motion is nontrivial
    mag = np.linalg.norm(gt_sel[0], axis=-1)
    roi = mag > max(1e-6, 0.25 * mag.max())
    print(
        f"[{dataset}] pair {t_sel}: mean|gt| {disp[t_sel]:.2f}px, roi frac "
        f"{roi.mean():.2f}, roi mean flow "
        f"({gt_sel[0][roi].mean(0)[0]:+.2f},{gt_sel[0][roi].mean(0)[1]:+.2f})",
        flush=True,
    )
    return one_pair, gt_sel, roi


DATA = {
    "rect": pick_pair("rectangle2d_tex", "data_cache"),
    "vfast": pick_pair("vortex2d_fast", "data_cache"),
}

CONDS = [
    # (name, dataset, trainer kwargs)
    ("rect_base_lr2e-4", "rect", {}),
    ("rect_lr1e-3", "rect", {"lr": 1e-3}),
    ("rect_census1", "rect", {"loss": UPFlowLossConfig(census_weight=1.0)}),
    ("rect_census1_lr1e-3", "rect",
     {"lr": 1e-3, "loss": UPFlowLossConfig(census_weight=1.0)}),
    ("rect_census1_nosmooth", "rect",
     {"loss": UPFlowLossConfig(census_weight=1.0, smooth_order_1_weight=0.0)}),
    ("vfast_base_lr2e-4", "vfast", {}),
    ("vfast_census1", "vfast", {"loss": UPFlowLossConfig(census_weight=1.0)}),
]


def run(name, data_key, kw):
    one_pair, gt_full, roi = DATA[data_key]
    cfg = UPFlowTrainConfig(exp_dir=f"/tmp/diag_{name}", n_data=1,
                            batch_size=1, hbm_dataset_gb=0.0,
                            **({"lr": 2e-4} | kw))
    tr = UPFlowTrainer(cfg)
    tr.init_state(one_pair)
    batch = jax.device_put(
        {"im1": jnp.asarray(one_pair[:, 0]), "im2": jnp.asarray(one_pair[:, 1])},
        tr.batch_sharding)
    rng0 = jax.random.PRNGKey(7)
    t0 = time.time()
    for step in range(1, STEPS + 1):
        tr.state, parts = tr._jit_train(tr.state, batch, jax.random.fold_in(rng0, step))
        if step % REPORT == 0 or step == 1:
            _, extras = tr._jit_eval(tr.state, batch)
            flow = np.asarray(extras["flow_f"])[0][: roi.shape[0], : roi.shape[1]]
            pb = flow[roi].mean(0)
            epe_roi = float(
                np.linalg.norm(flow[roi] - gt_full[0][roi], axis=-1).mean())
            epe0 = float(np.linalg.norm(gt_full[0][roi], axis=-1).mean())
            print(f"{name} step {step}: photo {float(parts['photo_loss']):.4f} "
                  f"pred_roi ({pb[0]:+.2f},{pb[1]:+.2f}) epe_roi {epe_roi:.3f} "
                  f"(zero {epe0:.3f}) |flow|max {np.abs(flow).max():.3f} "
                  f"({step/(time.time()-t0):.1f} it/s)", flush=True)
    del tr


for name, data_key, kw in CONDS:
    print(f"=== {name} ===", flush=True)
    run(name, data_key, kw)
print("DONE", flush=True)
