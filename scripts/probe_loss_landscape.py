"""Diagnostic: unsupervised-loss landscape along flow = alpha * GT.

The 3-point probe (verify skill) checks loss(GT) < loss(0) < loss(runaway) —
necessary but not sufficient: a *barrier* at intermediate alpha (loss(0.5*GT)
> loss(0)) still defeats gradient descent from the zero-flow init.  This
sweeps alpha in [0, 1.25] for the photometric and census terms separately.

Run on CPU while a TPU job owns the chip:
    python scripts/probe_loss_landscape.py [dataset]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from opticalflowscivis_tpu.data import get_spec
from opticalflowscivis_tpu.data.registry import load_raw_series
from opticalflowscivis_tpu.losses.upflow import photo_loss_multi_type
from opticalflowscivis_tpu.ops.census import census_loss
from opticalflowscivis_tpu.ops.warp import backward_warp

dataset = sys.argv[1] if len(sys.argv) > 1 else "rectangle2d_tex"
spec = get_spec(dataset)
series = load_raw_series(dataset, "data_cache", "train")
k = 9
im1 = jnp.asarray(series[: k - 1, ..., :1])
im2 = jnp.asarray(series[1:k, ..., :1])
gt = jnp.asarray(series[: k - 1, ..., 1 : 1 + spec.ndim]) * spec.gt_flow_stride

occ = jnp.ones(im1.shape[:-1] + (1,), jnp.float32)
print(f"{dataset}: {k-1} pairs, GT mean |flow| "
      f"{float(jnp.linalg.norm(gt, axis=-1).mean()):.3f}")
print(f"{'alpha':>6} {'photo':>10} {'census':>10}")
for alpha in [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0, 1.1, 1.25]:
    flow = alpha * gt
    warped = backward_warp(im2, flow, padding="border")
    p = float(photo_loss_multi_type(im1, warped, occ, loss_type="abs_robust"))
    c = float(census_loss(im1, warped, occ, robust=True))
    print(f"{alpha:>6.2f} {p:>10.5f} {c:>10.5f}")
