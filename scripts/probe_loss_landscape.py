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

# -- scale sweep: the same landscape at the DECODED pyramid resolutions ------
# The training losses are full-res, but the flow is produced by a 1/64..1/4
# coarse-to-fine decode: if census/photo lose their minimum at GT once the
# images are downsampled to a decode level's resolution (flow scaled to
# match), the cost-volume levels have no basin to establish the global shift
# and only the final full-res upsample carries signal — a structural reading
# of the pan stall (VERDICT r4 #1a).
def down(img, s):
    """Mean-pool by s — the alias-free downsample a feature pyramid
    approximates (plain bilinear w/o antialias would point-sample and
    overstate small-scale ambiguity)."""
    if s == 1:
        return img
    b, h, w, c = img.shape
    return img.reshape(b, h // s, s, w // s, s, c).mean(axis=(2, 4))


print("\nper-decode-scale landscape (images downsampled, flow scaled):")
print(f"{'scale':>6} {'metric':>7} " + " ".join(f"a={a:<4}" for a in
                                                [0.0, 0.5, 0.9, 1.0, 1.1]))
for s in (1, 2, 4, 8, 16):
    i1s, i2s = down(im1, s), down(im2, s)
    gts = down(gt, s) / s
    occs = jnp.ones(i1s.shape[:-1] + (1,), jnp.float32)
    rows = {"photo": [], "census": []}
    for alpha in [0.0, 0.5, 0.9, 1.0, 1.1]:
        w = backward_warp(i2s, alpha * gts, padding="border")
        rows["photo"].append(
            float(photo_loss_multi_type(i1s, w, occs, loss_type="abs_robust")))
        rows["census"].append(float(census_loss(i1s, w, occs, robust=True)))
    for m, vals in rows.items():
        print(f"{'1/'+str(s):>6} {m:>7} " +
              " ".join(f"{v:.4f}" for v in vals))
