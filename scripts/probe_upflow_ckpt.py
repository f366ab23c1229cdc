"""Diagnostic: inspect the flow field a trained UPFlow checkpoint predicts.

Run on CPU while a TPU training job owns the chip:
    python scripts/probe_upflow_ckpt.py [dataset]

Reports mean/max |flow| overall, on the moving box (GT flow != 0) and on the
static background, to distinguish "flow frozen at zero" (structural/optimization
stall) from "noisy but learning".
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

from opticalflowscivis_tpu.data import get_spec
from opticalflowscivis_tpu.data.registry import load_raw_series
from opticalflowscivis_tpu.training.upflow_trainer import (
    UPFlowTrainConfig, UPFlowTrainer, frames_to_pairs,
)

dataset = sys.argv[1] if len(sys.argv) > 1 else "rectangle2d_tex"
spec = get_spec(dataset)
series = load_raw_series(dataset, "data_cache", "val")
k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
pairs = frames_to_pairs(series[:k, ..., :1], in_channels=3)
gt = series[: k - 1, ..., 1 : 1 + spec.ndim] * spec.gt_flow_stride

# must match the run's optimizer chain or the Orbax tree mismatches:
# UPFLOW_RECIPE=ex_runner reproduces the weight-decay/lr-decay chain.
_kw = dict(
    exp_dir=os.environ.get("UPFLOW_EXP_DIR", f"Results/{dataset}/upflow"),
    n_data=1,
    grad_clip=float(os.environ.get("UPFLOW_GRAD_CLIP", "0")),
)
if os.environ.get("UPFLOW_RECIPE", "") == "ex_runner":
    cfg = UPFlowTrainConfig.preset_ex_runner(**_kw)
else:
    cfg = UPFlowTrainConfig(**_kw)
tr = UPFlowTrainer(cfg)
# steps_per_epoch>0 materializes the lr-decay schedule state when the run's
# recipe has lr_gamma != 1 — the opt tree must match to restore.
tr.init_state(pairs[:1], steps_per_epoch=1 if cfg.lr_gamma != 1.0 else 0)
assert tr.load_checkpoint(), "no checkpoint"
_, extras = tr.predict(pairs)
flow = np.asarray(extras["flow_f"])[:, : gt.shape[1], : gt.shape[2]]

mag = np.linalg.norm(flow, axis=-1)
gt_mag = np.linalg.norm(gt, axis=-1)
box = gt_mag > 1e-6
print(f"pred |flow|: mean {mag.mean():.4f} max {mag.max():.4f}")
print(f"  on box (GT!=0, {box.mean()*100:.1f}% px): mean {mag[box].mean():.4f}")
if (~box).any():  # pan datasets move every pixel — no static background
    print(f"  on bg: mean {mag[~box].mean():.4f} max {mag[~box].max():.4f}")
print(f"GT on box: mean {gt_mag[box].mean():.4f} max {gt_mag.max():.4f}")
epe = np.linalg.norm(flow - gt, axis=-1)
print(f"EPE: overall {epe.mean():.4f}  box {epe[box].mean():.4f}  bg {epe[~box].mean():.4f}")
# per-component correlation with GT on the box
for i, name in enumerate("yx"[-spec.ndim:]):
    c = np.corrcoef(flow[..., i][box], gt[..., i][box])[0, 1]
    print(f"corr(pred_{name}, gt_{name}) on box: {c:.3f}")
# per-pair: GT box displacement vs mean predicted flow on the box
print(f"{'pair':>4} {'gt(dy,dx)':>14} {'pred(dy,dx)':>16} {'epe':>7} {'epe0':>7}")
for t in range(k - 1):
    bx = box[t]
    g = gt[t][bx].mean(0)
    p_ = flow[t][bx].mean(0)
    print(f"{t:>4} ({g[0]:>5.2f},{g[1]:>5.2f}) ({p_[0]:>6.2f},{p_[1]:>6.2f})"
          f" {epe[t].mean():>7.3f} {gt_mag[t].mean():>7.3f}")
