"""Roofline analysis of the hot steps — VERDICT r2 item 4.

For each benched step (RIFE-2D inference, RIFE-2D train, UPFlow train) this
reports, from the XLA-compiled executable's own cost analysis:

- F = model FLOPs/call, B = HBM bytes touched/call, intensity I = F/B;
- the v5e roofline bound t_min = max(F / peak_flops, B / peak_bw) and which
  roof binds (compute vs HBM bandwidth);
- measured wall seconds/call (relay-chained, CLAUDE.md discipline), the same
  minus the measured per-call relay overhead (device-time estimate), and
  achieved FLOP/s and bytes/s as fractions of their peaks.

The point (per VERDICT round 2): a raw "2.76% MFU" headline is meaningless if
the step is bandwidth-bound — utilization must be quoted against the roof that
actually binds.  Protocol anchor: Flow-2D/benchmark/testtime.py:17-29.

Usage: python scripts/roofline.py [out.json]   (runs on whatever chip JAX sees)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK_FLOPS = 197e12  # bf16
V5E_PEAK_HBM_BPS = 819e9  # ~819 GB/s HBM bandwidth (public v5e spec)
ITERS = 12


def _chain(fn, args, iters=ITERS):
    s = jnp.float32(0.0)
    float(fn(s, *args))
    s = jnp.float32(1e-6)
    t0 = time.perf_counter()
    for i in range(iters):
        s = fn(s + i * 1e-5, *args)
    float(s)
    return (time.perf_counter() - t0) / iters


def _cost(jitted, *args):
    c = jitted.lower(jnp.float32(0.0), *args).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def _relay_overhead():
    """Per-materialized-call host round-trip (~25 ms through the axon relay):
    measured on a trivially small chained op so device time ~ 0."""

    @jax.jit
    def tiny(eps, x):
        return (x + eps).sum() * 1e-6

    x = jnp.ones((8,), jnp.float32)
    return _chain(tiny, (x,), iters=16)


def rife2d_inference():
    from opticalflowscivis_tpu.models import ifnet_2d

    net = ifnet_2d(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    img0 = jax.random.uniform(key, (32, 160, 224, 1), jnp.float32)
    img1 = jax.random.uniform(jax.random.fold_in(key, 1), img0.shape, jnp.float32)
    params = jax.jit(net.init)(key, img0, img1, None)

    @jax.jit
    def fwd(eps, params, a, b):
        out = net.apply(params, a + eps, b + eps, None)
        return jnp.sum(out["merged"][-1].astype(jnp.float32)) * 1e-12

    return fwd, (params, img0, img1), 32


def rife2d_train():
    from opticalflowscivis_tpu.data import group_tuples, rectangle_2d
    from opticalflowscivis_tpu.losses.rife import RIFELossWeights
    from opticalflowscivis_tpu.training import ModelConfig, TrainConfig, Trainer

    cfg = TrainConfig(
        dataset="rectangle2d", batch_size=64, model=ModelConfig(),
        loss=RIFELossWeights.preset_2d(flow_supervised=True),
        data_dir="/tmp/bench_data", log_dir="/tmp/bench_log",
        results_dir="/tmp/bench_res",
    )
    tr = Trainer(cfg)
    arr = rectangle_2d(n_frames=3 * 64 * 2, grid=(128, 128), box=(60, 80), seed=0)
    tuples = group_tuples(arr, 1).astype(np.float32)
    tr.init_state(tuples[:64], total_steps=100)
    batch0 = jax.device_put(jnp.asarray(tuples[:64]), tr.batch_sharding)
    state = {"s": tr.state}

    def step(eps, batch):
        state["s"], parts = tr._jit_train(state["s"], batch + eps)
        return parts["loss_G"] * 1e-6

    # cost analysis needs the jitted fn directly
    return step, (batch0,), 64, tr._jit_train, (tr.state, batch0)


def upflow_train():
    from opticalflowscivis_tpu.training.upflow_trainer import (
        UPFlowTrainConfig,
        UPFlowTrainer,
    )

    cfg = UPFlowTrainConfig(batch_size=8, exp_dir="/tmp/bench_upflow",
                            n_data=1, hbm_dataset_gb=0.0)
    tr = UPFlowTrainer(cfg)
    key = jax.random.PRNGKey(0)
    pairs = np.asarray(jax.random.uniform(key, (8, 2, 256, 832, 3), jnp.float32))
    tr.init_state(pairs)
    dev = jax.device_put(
        {"im1": jnp.asarray(pairs[:, 0]), "im2": jnp.asarray(pairs[:, 1])},
        tr.batch_sharding)
    rng = jax.random.PRNGKey(1)
    state = {"s": tr.state}

    def step(eps, batch):
        state["s"], parts = tr._jit_train(
            state["s"], jax.tree.map(lambda x: x + eps, batch), rng)
        return parts["loss_total"] * 1e-6

    return step, (dev,), 8, tr._jit_train, (tr.state, dev, rng)


def analyze(name, fn, args, batch, cost_fn=None, cost_args=None, results=None):
    # fn is either a jitted fn (has .lower) or a python closure over one.
    # Cost analysis runs FIRST (donated buffers are consumed by the chain;
    # lowering with live arrays avoids deleted-buffer edge cases).
    try:
        if cost_fn is None:
            cost_fn, cost_args = fn, (jnp.float32(0.0),) + args
        cost_args = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
            cost_args,
        )
        c = cost_fn.lower(*cost_args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        flops, bytes_ = float(c.get("flops", 0)), float(c.get("bytes accessed", 0))
    except Exception as e:  # noqa: BLE001
        flops = bytes_ = float("nan")
        print(f"{name}: cost analysis failed: {e}")
    sec = _chain(fn, args)
    overhead = results["relay_overhead_s"]
    t_compute = flops / V5E_PEAK_FLOPS
    t_bw = bytes_ / V5E_PEAK_HBM_BPS
    binding = "hbm_bandwidth" if t_bw > t_compute else "compute"
    entry = {
        "wall_s_per_call": sec,
        "throughput_per_sec_wall": batch / sec,
        "flops_per_call": flops,
        "bytes_per_call": bytes_,
        "arith_intensity_flop_per_byte": flops / bytes_ if bytes_ else None,
        "roofline_min_s": max(t_compute, t_bw),
        "binding_roof": binding,
    }
    # The relay pipelines chained dispatches, so a short step can show LESS
    # wall time per call than the tiny-op overhead probe; in that regime the
    # device time is below the relay measurement floor and per-device
    # utilization numbers would be meaningless (r3 run printed 4e8% here).
    if sec > 1.5 * overhead:
        dev_sec = sec - overhead
        entry.update({
            "device_s_per_call_est": dev_sec,
            "throughput_per_sec_device": batch / dev_sec,
            "mfu_device": (flops / dev_sec) / V5E_PEAK_FLOPS,
            "hbm_util_device": (bytes_ / dev_sec) / V5E_PEAK_HBM_BPS,
            "roofline_efficiency": max(t_compute, t_bw) / dev_sec,
        })
        util = (f"device~{dev_sec*1e3:.1f} ms, "
                f"roofline_eff={entry['roofline_efficiency']:.2%}, "
                f"mfu={entry['mfu_device']:.2%}, hbm={entry['hbm_util_device']:.2%}")
    else:
        entry["below_relay_floor"] = True
        util = (f"device time below relay floor ({overhead*1e3:.1f} ms) — "
                f"wall-bound; roofline_min={entry['roofline_min_s']*1e3:.1f} ms")
    results[name] = entry
    print(f"{name}: wall {sec*1e3:.1f} ms, "
          f"F={flops/1e9:.2f} GF, B={bytes_/1e9:.3f} GB, I={entry['arith_intensity_flop_per_byte']:.1f}, "
          f"binds={binding}, {util}",
          flush=True)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "Results/roofline.json"
    results = {
        "device_kind": jax.devices()[0].device_kind,
        "peak_flops_assumed": V5E_PEAK_FLOPS,
        "peak_hbm_bps_assumed": V5E_PEAK_HBM_BPS,
    }
    results["relay_overhead_s"] = _relay_overhead()
    print(f"relay overhead: {results['relay_overhead_s']*1e3:.1f} ms/call", flush=True)

    fn, args, batch = rife2d_inference()
    analyze("rife2d_inference_b32_160x224", fn, args, batch, results=results)

    step, sargs, b, costf, costa = rife2d_train()
    analyze("rife2d_train_b64_128x128", step, sargs, b, cost_fn=costf,
            cost_args=costa, results=results)

    step, sargs, b, costf, costa = upflow_train()
    analyze("upflow_train_b8_256x832", step, sargs, b, cost_fn=costf,
            cost_args=costa, results=results)

    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
