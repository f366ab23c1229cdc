"""Root-cause study: why does distill=0.1 collapse 3-D training here when the
reference trains with it (Flow-3D/model/RIFE.py:241)?

Hypothesis: interplay between distillation and the bounded TPU warps.  The
3-D preset bounds warp gradients to radius 8 (bounded_warp_rz / fast_warp_r),
matching rectangle3d's max per-step velocity of ±8 — i.e. true flows already
sit AT the live-gradient boundary.  The teacher block's flow is unconstrained;
distillation drags student flows toward it, and any excursion past the radius
zeroes every warp gradient, freezing training at a constant (the measured
round-1 signature: val rises from epoch ~2 then freezes).

Conditions (small scale: 24^3, tiny model, CPU mesh):
  A  distill=0.0, bounded warps        (round-1 stable default)
  B  distill=0.1, bounded warps        (reference weight; expected collapse)
  C  distill=0.1, exact gather warps   (unbounded grads; expected stable)
  D  distill=0.1, bounded + flow_leash (candidate fix; expected stable)

Each run reports the val loss_G trajectory, the max |flow| on a val batch at
the end, and a collapse verdict (final val > 1.05x best val).
Usage: JAX must see >= 2 devices (run under tests-style CPU mesh or TPU).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import jax

if __name__ == "__main__" and os.environ.get("DISTILL_STUDY_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opticalflowscivis_tpu.data import group_tuples, rectangle_3d
from opticalflowscivis_tpu.losses.rife import RIFELossWeights
from opticalflowscivis_tpu.training import ModelConfig, TrainConfig, Trainer
from opticalflowscivis_tpu.training.config import OptimConfig

GRID = (24, 24, 24)
EPOCHS = int(os.environ.get("DISTILL_STUDY_EPOCHS", "40"))
FRAMES = 160
# The default warmup (2000 steps) exceeds this study's entire step budget
# (~16 steps/epoch); scale the schedule so the control condition actually
# trains — a frozen control says nothing about distillation.
OPTIM = OptimConfig(warmup_steps=100)


def run_condition(name: str, distill: float, bounded: bool, leash: float,
                  tmp: str, bf16: bool = False):
    model = ModelConfig(
        ndim=3, block_channels=(12, 8, 8), teacher_channels=8, conv0_kernel=3,
        bfloat16=bf16,
        bounded_warp_rz=8 if bounded else 0,
        fast_warp_r=8 if bounded else 0,
    )
    loss = dataclasses.replace(
        RIFELossWeights.preset_3d(distill=distill),
        flow_leash=leash, flow_leash_radius=8.0 if leash else 0.0,
    )
    cfg = TrainConfig(
        dataset="rectangle3d", batch_size=8, epochs=EPOCHS,
        model=model, loss=loss, optim=OPTIM,
        data_dir=os.path.join(tmp, "d"), log_dir=os.path.join(tmp, name),
        results_dir=os.path.join(tmp, name, "res"),
        hbm_dataset_gb=0.0,
    )
    arr = rectangle_3d(n_frames=FRAMES, grid=GRID, box=(8, 8, 8), seed=3)
    tuples = group_tuples(arr, 1).astype(np.float32)
    n = tuples.shape[0]
    tr = Trainer(cfg)
    hist = tr.fit(tuples[: int(0.8 * n)], tuples[int(0.8 * n):], log_every=0)
    val = [h["loss_G"] for h in hist]
    _, extras = tr.predict(tuples[int(0.8 * n):][:8])
    flow = np.asarray(extras["flow"], np.float32)
    report = {
        "condition": name,
        "val_first": round(val[0], 4),
        "val_best": round(min(val), 4),
        "val_final": round(val[-1], 4),
        "best_epoch": int(np.argmin(val)),
        "flow_absmax": round(float(np.abs(flow).max()), 2),
        "flow_p99": round(float(np.percentile(np.abs(flow), 99)), 2),
        "collapsed": bool(val[-1] > 1.05 * min(val)),
        "val_curve": [round(v, 4) for v in val],
    }
    print(json.dumps(report), flush=True)
    return report


CONDITIONS = [
    # (name, distill, bounded, leash, bf16)
    ("A_distill0_bounded", 0.0, True, 0.0, False),
    ("B_distill01_bounded", 0.1, True, 0.0, False),
    ("C_distill01_exact", 0.1, False, 0.0, False),
    ("D_distill01_bounded_leash", 0.1, True, 0.01, False),
    # round-1 collapse was observed with the real recipe (bf16 compute);
    # A-C ran fp32 and did not collapse — bisect the dtype axis:
    ("E_distill01_bounded_bf16", 0.1, True, 0.0, True),
    ("F_distill0_bounded_bf16", 0.0, True, 0.0, True),
]


def main():
    tmp = os.environ.get("DISTILL_STUDY_DIR", "/tmp/distill_study")
    os.makedirs(tmp, exist_ok=True)
    only = os.environ.get("DISTILL_STUDY_ONLY", "")
    reports = []
    for name, distill, bounded, leash, bf16 in CONDITIONS:
        if only and name[0] not in only:
            continue
        reports.append(run_condition(name, distill, bounded, leash, tmp, bf16))
    with open(os.path.join(tmp, "study.json"), "w") as f:
        json.dump(reports, f, indent=2)
    print("SUMMARY")
    for r in reports:
        print(f"  {r['condition']}: best={r['val_best']} final={r['val_final']} "
              f"best_epoch={r['best_epoch']} |flow|max={r['flow_absmax']} "
              f"collapsed={r['collapsed']}", flush=True)


if __name__ == "__main__":
    main()
