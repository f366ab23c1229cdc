"""Measured device time for the hot train steps via jax.profiler — VERDICT r3 #6.

Round 3's roofline (scripts/roofline.py) ESTIMATED device time as wall minus a
measured relay overhead and took bytes from the executable's cost analysis,
which over-counts post-fusion traffic (its UPFlow row implied >100% of the HBM
roof).  This script replaces the estimate with a measurement: it runs each
step under ``utils.profiling.trace`` (jax.profiler → xplane) and parses the
device plane's "XLA Modules" line — the module execution intervals ARE the
device time, relay and host dispatch excluded by construction.

Per step it reports:
- device seconds/step (sum of module-execution durations / n steps);
- wall seconds/step over the same traced window (the relay+dispatch gap is
  the difference);
- top ops by device time (XLA Ops line) — where the step actually spends it;
- post-fusion FLOPs and bytes-accessed from compiled cost_analysis, with
  achieved FLOP/s / bytes/s against the v5e roofs quoted AGAINST MEASURED
  DEVICE TIME (roofline.json v2).

Protocol anchor: Flow-2D/benchmark/testtime.py:17-29 (timed calls after
warmup); SURVEY §5 tracing row.

Usage: python scripts/trace_steps.py [out.json]   (run on the TPU chip)
"""
from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK_FLOPS = 197e12  # bf16 (public v5e spec)
V5E_PEAK_HBM_BPS = 819e9
TRACE_STEPS = 6


def _parse_xspace(logdir: str, n_steps: int) -> dict:
    """Device time + top-op table from the newest xplane under ``logdir``."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(
        os.path.join(logdir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        return {"error": "no xplane produced"}
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    out: dict = {"planes": [p.name for p in xs.planes]}
    dev = [p for p in xs.planes if "TPU" in p.name or "device" in p.name.lower()]
    if not dev:
        out["error"] = ("no device plane — the profiler saw host activity "
                        "only (axon relay may not forward device traces)")
        return out
    plane = dev[0]
    meta = {m.id: m.name for m in plane.event_metadata.values()}
    by_line: dict[str, float] = {}
    ops: dict[str, float] = {}
    for line in plane.lines:
        total = sum(e.duration_ps for e in line.events)
        by_line[line.name] = total / 1e12
        if "op" in line.name.lower():
            for e in line.events:
                name = meta.get(e.metadata_id, str(e.metadata_id))
                ops[name] = ops.get(name, 0.0) + e.duration_ps / 1e12
    # module line = per-executable execution intervals (device busy time)
    mod_line = next(
        (n for n in by_line if "module" in n.lower()),
        max(by_line, key=lambda n: by_line[n]) if by_line else None,
    )
    out["device_plane"] = plane.name
    out["line_seconds"] = {k: round(v, 6) for k, v in by_line.items()}
    if mod_line is not None:
        out["device_sec_per_step"] = by_line[mod_line] / n_steps
        out["module_line"] = mod_line
    if ops:
        top = sorted(ops.items(), key=lambda kv: -kv[1])[:12]
        out["top_ops_sec_per_step"] = {
            k: round(v / n_steps, 6) for k, v in top
        }
    return out


def _cost(lowered_compiled) -> tuple[float, float]:
    c = lowered_compiled.cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def _trace_step(name: str, run_step, compiled, logdir_root: str) -> dict:
    """Warm (outside trace), then trace TRACE_STEPS chained steps."""
    from opticalflowscivis_tpu.utils.profiling import trace

    logdir = os.path.join(logdir_root, name)
    run_step()  # compile + warm
    run_step()
    t0 = time.perf_counter()
    with trace(logdir):
        for _ in range(TRACE_STEPS):
            r = run_step()
        jax.block_until_ready(r)
    wall = (time.perf_counter() - t0) / TRACE_STEPS
    rec = {"wall_sec_per_step": round(wall, 6), "trace_dir": logdir}
    rec.update(_parse_xspace(logdir, TRACE_STEPS))
    flops, byts = _cost(compiled)
    rec["flops_per_call_post_fusion"] = flops
    rec["bytes_accessed_post_fusion"] = byts
    dev = rec.get("device_sec_per_step")
    if dev:
        rec["device_sec_per_step"] = round(dev, 6)
        rec["achieved_flops_frac_of_peak"] = round(flops / dev / V5E_PEAK_FLOPS, 5)
        rec["achieved_bytes_frac_of_peak"] = round(byts / dev / V5E_PEAK_HBM_BPS, 5)
        rec["relay_plus_dispatch_sec"] = round(wall - dev, 6)
    return rec


def rife2d_train() -> dict:
    from opticalflowscivis_tpu.data import group_tuples, rectangle_2d
    from opticalflowscivis_tpu.losses.rife import RIFELossWeights
    from opticalflowscivis_tpu.training import ModelConfig, TrainConfig, Trainer

    cfg = TrainConfig(
        dataset="rectangle2d", batch_size=64, model=ModelConfig(),
        loss=RIFELossWeights.preset_2d(flow_supervised=True),
        data_dir="/tmp/trace_data", log_dir="/tmp/trace_log",
        results_dir="/tmp/trace_res",
    )
    tr = Trainer(cfg)
    arr = rectangle_2d(n_frames=3 * 64, grid=(128, 128), box=(60, 80), seed=0)
    tuples = group_tuples(arr, 1).astype(np.float32)
    tr.init_state(tuples[:64], total_steps=100)
    batch = jax.device_put(jnp.asarray(tuples[:64]), tr.batch_sharding)
    holder = {"state": tr.state}

    def run():
        holder["state"], parts = tr._jit_train(holder["state"], batch)
        return parts["loss_G"]

    compiled = tr._jit_train.lower(holder["state"], batch).compile()
    return _trace_step("rife2d_train_b64_128", run, compiled, "/tmp/traces")


def upflow_train() -> dict:
    from opticalflowscivis_tpu.training.upflow_trainer import (
        UPFlowTrainConfig,
        UPFlowTrainer,
    )

    batch = 8
    cfg = UPFlowTrainConfig(batch_size=batch, exp_dir="/tmp/trace_upflow",
                            n_data=1, hbm_dataset_gb=0.0)
    tr = UPFlowTrainer(cfg)
    pairs = np.asarray(jax.random.uniform(
        jax.random.PRNGKey(0), (batch, 2, 256, 832, 3), jnp.float32))
    tr.init_state(pairs)
    dev = jax.device_put(
        {"im1": jnp.asarray(pairs[:, 0]), "im2": jnp.asarray(pairs[:, 1])},
        tr.batch_sharding,
    )
    holder = {"state": tr.state, "i": 0}
    rng = jax.random.PRNGKey(1)

    def run():
        holder["i"] += 1
        holder["state"], parts = tr._jit_train(
            holder["state"], dev, jax.random.fold_in(rng, holder["i"]))
        return parts["loss_total"]

    compiled = tr._jit_train.lower(
        holder["state"], dev, jax.random.fold_in(rng, 0)).compile()
    return _trace_step("upflow_train_b8_256x832", run, compiled, "/tmp/traces")


def rife3d_inference() -> dict:
    """256³ vol-pair inference — the BASELINE.json north-star stand-in
    (0.607 vols/s each round since r3, never traced).  b1, bf16, the
    benchmark/testtime.py protocol with an eps-chain for uncacheability."""
    from opticalflowscivis_tpu.models import ifnet_3d

    net = ifnet_3d(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    shape = (1, 256, 256, 256, 1)
    v0 = jax.random.uniform(key, shape, jnp.float32)
    v1 = jax.random.uniform(jax.random.fold_in(key, 1), shape, jnp.float32)
    params = jax.jit(net.init)(
        key, v0[:, :32, :32, :32], v0[:, :32, :32, :32], None)

    @jax.jit
    def forward(eps, v0, v1):
        out = net.apply(params, v0 + eps, v1 + eps, None)["merged"][-1]
        return jnp.sum(out.astype(jnp.float32)) * 1e-12

    holder = {"s": jnp.float32(0.0)}

    def run():
        holder["s"] = forward(holder["s"], v0, v1)
        return holder["s"]

    compiled = forward.lower(holder["s"], v0, v1).compile()
    return _trace_step("rife3d_inference_256", run, compiled, "/tmp/traces")


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "Results/trace_summary.json"
    report = {"backend": jax.default_backend(),
              "device_kind": jax.devices()[0].device_kind,
              "trace_steps": TRACE_STEPS}
    only = os.environ.get("TRACE_ONLY", "")  # substring filter, e.g. "upflow"
    for name, fn in [("rife2d_train", rife2d_train),
                     ("upflow_train", upflow_train),
                     ("rife3d_inference", rife3d_inference)]:
        if only and only not in name:
            continue
        print(f"tracing {name} ...", flush=True)
        try:
            report[name] = fn()
        except Exception as e:  # noqa: BLE001 — record, keep going
            report[name] = {"error": repr(e)}
        print(json.dumps(report[name])[:400], flush=True)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
