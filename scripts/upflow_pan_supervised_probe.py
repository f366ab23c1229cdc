"""Structural probe: can UPFlowNet FIT a uniform translation at all?

Supervised overfit (mean-EPE loss straight on flow_f) of the full UPFlowNet
on the 4 distinct-pan pairs used by upflow_pan_diag.  This isolates the
model/gradient path from the unsupervised loss recipe:

- supervised converges + unsupervised grid doesn't  -> recipe problem;
- supervised ALSO fails                             -> cost-volume decode /
  gradient-path bug, and the long pan runs are moot until it's fixed.

Usage: python scripts/upflow_pan_supervised_probe.py [steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from opticalflowscivis_tpu.data import get_spec, pad_to_multiple
from opticalflowscivis_tpu.data.registry import load_raw_series
from opticalflowscivis_tpu.models.upflow import UPFlowConfig, UPFlowNet

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 300
DATASET = sys.argv[2] if len(sys.argv) > 2 else "rectangle2d_tex_pan"
REPORT = max(1, STEPS // 10)
B = 4


def pick_batch():
    spec = get_spec(DATASET)
    series = load_raw_series(DATASET, "data_cache", "val")
    k = min(len(series), 40)
    from opticalflowscivis_tpu.training.upflow_trainer import frames_to_pairs

    pairs = frames_to_pairs(series[:k, ..., :1], in_channels=3)
    gt = series[: k - 1, ..., 1 : 1 + spec.ndim] * spec.gt_flow_stride
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
    return batch_pairs, gt[sel]


def main():
    pairs, gt_np = pick_batch()
    H, W = gt_np.shape[1:3]
    im1 = jnp.asarray(pairs[:, 0])
    im2 = jnp.asarray(pairs[:, 1])
    gt = jnp.asarray(np.pad(
        gt_np, ((0, 0), (0, im1.shape[1] - H), (0, im1.shape[2] - W), (0, 0))))
    valid = jnp.asarray(np.pad(
        np.ones((B, H, W, 1), np.float32),
        ((0, 0), (0, im1.shape[1] - H), (0, im1.shape[2] - W), (0, 0))))

    # match the trainer's model config (feature-norm on — required, see
    # UPFlowTrainConfig.model)
    net = UPFlowNet(UPFlowConfig(
        if_norm_before_cost_volume=True,
        norm_moments_across_channels=False,
        norm_moments_across_images=False,
    ))
    params = jax.jit(net.init)(jax.random.PRNGKey(0), im1, im2)
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    def loss_fn(p):
        out = net.apply(p, im1, im2)
        epe = jnp.linalg.norm(out["flow_f"] - gt, axis=-1, keepdims=True)
        return jnp.sum(epe * valid) / jnp.sum(valid), out["flow_f"]

    @jax.jit
    def step(p, o):
        (l, flow), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        gnorm = optax.global_norm(g)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, l, gnorm, flow

    t0 = time.time()
    for s in range(1, STEPS + 1):
        params, opt, l, gnorm, flow = step(params, opt)
        if s % REPORT == 0 or s == 1:
            fl = np.asarray(flow)[:, :H, :W]
            med = [tuple(np.round(np.median(fl[i].reshape(-1, 2), 0), 2))
                   for i in range(B)]
            print(f"step {s}: epe {float(l):.3f} gnorm {float(gnorm):.2e} "
                  f"pred_med {med} ({s/(time.time()-t0):.2f} it/s)",
                  flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
