"""Stage-wise repro for the TPU worker crash in the scanned UPFlow epoch.

Round-4 finding: `UPFlowTrainer.fit_device_gen` / `fit` run one jitted
lax.scan per epoch; the first scanned epoch kills the TPU worker ("kernel
fault") deterministically, while the same train step dispatched per-step ran
fine in round 3.  The only Pallas kernel inside the UPFlow step is the
cost-volume (ops/pallas/correlation.py, custom VJP) — warp_with_mask uses the
jnp gather path (fast_r=0).  This script escalates:

  A. scan(3) over grad(sum(cost_volume))   [pallas backend]
  B. scan(3) over grad(sum(cost_volume))   [jnp backend]
  C. scan(3) over the full UPFlow train step, batch 8
  D. scan(100) over the full train step, batch 32  (the failing config)

Run solo on the TPU; the last printed stage before the crash is the culprit.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from opticalflowscivis_tpu.ops import cost_volume

STAGES = sys.argv[1].split(",") if len(sys.argv) > 1 else ["A", "B", "C", "D"]


def stage_corr(backend: str):
    b, h, w, c = 32, 32, 32, 32
    key = jax.random.PRNGKey(0)
    f1 = jax.random.normal(key, (b, h, w, c), jnp.float32)
    f2 = jax.random.normal(jax.random.fold_in(key, 1), (b, h, w, c))

    def loss(f1, f2):
        return cost_volume(f1, f2, 4, backend=backend).sum()

    def body(carry, _):
        g1, g2 = jax.grad(loss, argnums=(0, 1))(carry[0], carry[1])
        return (carry[0] + 1e-6 * g1, carry[1] + 1e-6 * g2), g1.mean()

    @jax.jit
    def run(f1, f2):
        (f1, f2), means = jax.lax.scan(body, (f1, f2), None, length=3)
        return means

    out = np.asarray(run(f1, f2))
    print(f"stage corr[{backend}] ok: {out}", flush=True)


def stage_train(batch: int, spe: int):
    from opticalflowscivis_tpu.training.upflow_trainer import (
        UPFlowTrainConfig,
        UPFlowTrainer,
    )

    cfg = UPFlowTrainConfig(
        batch_size=batch, exp_dir="/tmp/scan_repro_exp", n_data=1,
        grad_clip=1.0, lr=1e-3,
    )
    tr = UPFlowTrainer(cfg)
    pairs = np.random.default_rng(0).random((batch, 2, 128, 128, 3), np.float32)
    tr.init_state(pairs[:1])

    def body(carry, idx):
        rng = jax.random.fold_in(jax.random.PRNGKey(1), idx)
        batch_d = {"im1": carry_pairs[:, 0], "im2": carry_pairs[:, 1]}
        carry, parts = tr._train_step(carry, batch_d, rng)
        return carry, parts["loss_total"]

    carry_pairs = jnp.asarray(pairs)

    @jax.jit
    def run(state):
        state, losses = jax.lax.scan(body, state, jnp.arange(spe))
        return state, losses

    t0 = time.time()
    state, losses = run(tr.state)
    losses = np.asarray(losses)
    print(
        f"stage train b{batch} scan({spe}) ok: first {losses[0]:.4f} "
        f"last {losses[-1]:.4f} ({time.time()-t0:.1f}s incl compile)",
        flush=True,
    )


if __name__ == "__main__":
    print(f"backend {jax.default_backend()}", flush=True)
    if "A" in STAGES:
        stage_corr("pallas")
    if "B" in STAGES:
        stage_corr("jnp")
    if "C" in STAGES:
        stage_train(8, 3)
    if "D" in STAGES:
        stage_train(32, 100)
    if "E" in STAGES:
        stage_train(32, 3)
    if "F" in STAGES:
        stage_train(8, 100)
    if "G" in STAGES:
        stage_train(32, 30)
    if "H" in STAGES:
        stage_train(32, 10)
    print("all stages passed", flush=True)
