"""Benchmark — RIFE IFNet-2D inference throughput at Droplet-2D resolution.

Protocol mirrors the reference's ``Flow-2D/benchmark/testtime.py:17-29`` (timed
``model.inference`` calls after warmup) adapted to the north-star metric in
BASELINE.json: Droplet-2D interpolated pairs/sec/chip (160x224 single-channel
frames, README.md:7).  Runs on whatever chip JAX exposes (TPU v5e under the
driver; falls back to CPU).

Ordering is deliberate: the headline number is measured FIRST and its JSON line
printed (and flushed) IMMEDIATELY, so a stall in any detail sub-bench cannot
forfeit the round's perf evidence.  Detail sub-benches then run under a shared
wall-clock budget (BENCH_BUDGET_S, default 900 s) and are skipped-with-reason
on overrun; results go to bench_details.json.

Relay discipline (CLAUDE.md): the axon TPU relay caches identical calls and is
lazy (unmaterialized results never execute), and D2H is ~2 MB/s.  So each timed
call (1) takes an input perturbed by the PREVIOUS call's scalar output — chained
data dependency defeats caching and forces sequential device execution — and
(2) returns only a scalar; one tiny transfer at the end materializes the chain.

``vs_baseline`` reports achieved MFU (model FLOPs x calls / device-seconds /
chip peak FLOP/s): the reference publishes no comparable inference throughput
(its only recorded anchor is UPFlow *training* at ~9.8 pairs/s,
simple_train.py:56-59 — an apples-to-oranges divisor), so device-utilization vs
hardware peak is the defensible normalization.  Raw pairs/s is the headline
value; the old anchor ratio is kept in bench_details.json for continuity.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 32
H, W = 160, 224
ITERS = 12
REFERENCE_TRAIN_PAIRS_PER_SEC = 9.8  # UPFlow training anchor (simple_train.py:56-59)
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "900"))
_T0 = time.perf_counter()

# bf16 peak FLOP/s per chip by TPU generation (public specs); used for MFU.
_PEAK_FLOPS = {
    "v4": 275e12,
    "v5 lite": 197e12,
    "v5litepod": 197e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
    "v6 lite": 918e12,
}


def _remaining() -> float:
    return BUDGET_S - (time.perf_counter() - _T0)


def _peak_flops() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, peak in _PEAK_FLOPS.items():
        if key in kind:
            return peak
    return 197e12  # assume v5e (the driver's stated hardware) when unknown


def _timed_chain(fn, args, iters=ITERS):
    """Seconds/call over ``iters`` chained calls.

    ``fn(eps, *args) -> scalar``; call i feeds call i+1's ``eps``, so the relay
    must execute every call in sequence, no call is cacheable, and only the
    final scalar crosses the wire.
    """
    s = jnp.float32(0.0)
    float(fn(s, *args))  # compile + warm + materialize
    s = jnp.float32(1e-6)
    t0 = time.perf_counter()
    for i in range(iters):
        s = fn(s + i * 1e-5, *args)
    float(s)  # materialize the whole chain
    return (time.perf_counter() - t0) / iters


def _timed_scan(fn, args, iters=ITERS):
    """Seconds/call with the whole eps-chain inside ONE jitted lax.scan.

    The per-dispatch chain above pays one relay RPC per call (~45 ms on the
    axon tunnel — measured round 5 to exceed the 2-D inference step's own
    device time several times over); scanning the chain on device measures
    the CHIP's sustained rate, which is the deployable pairs/sec/chip number
    (real deployments have no relay).  Still uncacheable: each iteration
    feeds the next one's eps.  Program length stays ~1 s, far under the
    ~100 s worker-crash scale (RESULTS.md round 4)."""

    @jax.jit
    def chain(s0):
        def body(s, i):
            return fn(s + i.astype(jnp.float32) * 1e-5, *args), ()
        out, _ = jax.lax.scan(body, s0, jnp.arange(iters))
        return out

    float(chain(jnp.float32(0.0)))  # compile + warm + materialize
    t0 = time.perf_counter()
    r = float(chain(jnp.float32(1e-6)))
    assert np.isfinite(r)
    return (time.perf_counter() - t0) / iters


def bench_rife2d_inference():
    from opticalflowscivis_tpu.models import ifnet_2d

    net = ifnet_2d(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    img0 = jax.random.uniform(key, (BATCH, H, W, 1), jnp.float32)
    img1 = jax.random.uniform(jax.random.fold_in(key, 1), (BATCH, H, W, 1), jnp.float32)
    params = jax.jit(net.init)(key, img0, img1, None)

    def forward(eps, params, img0, img1):
        out = net.apply(params, img0 + eps, img1 + eps, None)
        return jnp.sum(out["merged"][-1].astype(jnp.float32)) * 1e-12

    # device-scanned chain = the chip's sustained rate (the headline);
    # per-dispatch chain = the r1-r4 protocol, kept in details for
    # cross-round comparability (it is relay-RPC-bound, ~45 ms/call floor)
    sec = _timed_scan(forward, (params, img0, img1), iters=32)
    sec_chained = _timed_chain(jax.jit(forward), (params, img0, img1))
    _DETAILS["rife2d_inference_chained_relay_pairs_per_sec"] = round(
        BATCH / sec_chained, 2
    )

    flops = None
    try:
        cost = jax.jit(forward).lower(
            jnp.float32(0.0), params, img0, img1).compile()
        cost = cost.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception:  # noqa: BLE001 — cost analysis is best-effort per backend
        pass
    return BATCH / sec, sec, flops


def bench_rife3d_inference(size=64, batch=4):
    from opticalflowscivis_tpu.models import ifnet_3d

    net = ifnet_3d(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    shape = (batch, size, size, size, 1)
    v0 = jax.random.uniform(key, shape, jnp.float32)
    v1 = jax.random.uniform(jax.random.fold_in(key, 1), shape, jnp.float32)
    params = jax.jit(net.init)(key, v0[:1, :32, :32, :32], v0[:1, :32, :32, :32], None)

    def forward(eps, params, a, b):
        out = net.apply(params, a + eps, b + eps, None)["merged"][-1]
        return jnp.sum(out.astype(jnp.float32)) * 1e-12

    sec = _timed_scan(forward, (params, v0, v1), iters=6)
    return batch / sec


def bench_train_step():
    from opticalflowscivis_tpu.data import group_tuples, rectangle_2d
    from opticalflowscivis_tpu.losses.rife import RIFELossWeights
    from opticalflowscivis_tpu.training import ModelConfig, TrainConfig, Trainer

    cfg = TrainConfig(
        dataset="rectangle2d", batch_size=64,
        model=ModelConfig(),
        loss=RIFELossWeights.preset_2d(flow_supervised=True),
        data_dir="/tmp/bench_data", log_dir="/tmp/bench_log",
        results_dir="/tmp/bench_res",
    )
    tr = Trainer(cfg)
    arr = rectangle_2d(n_frames=3 * 64 * 2, grid=(128, 128), box=(60, 80), seed=0)
    tuples = group_tuples(arr, 1).astype(np.float32)
    tr.init_state(tuples[:64], total_steps=100)

    batch0 = jax.device_put(jnp.asarray(tuples[:64]), tr.batch_sharding)
    state = tr.state

    # Chained: each step consumes the previous step's updated state — the true
    # training dependency structure, uncacheable by construction.
    def step(eps, batch):
        nonlocal state
        state, parts = tr._jit_train(state, batch + eps)
        return parts["loss_G"] * 1e-6

    sec = _timed_chain(step, (batch0,), iters=8)
    return 64 / sec


def bench_upflow_train():
    """UPFlow unsupervised train step at the reference's KITTI protocol —
    batch 8, 256x832 crops (simple_train.py:56-59 records ~9.8 pairs/s on the
    reference GPU; the ONLY apples-to-apples training-throughput anchor the
    reference publishes).  Pallas correlation is on via ops.cost_volume auto
    dispatch; data is device-resident (the measured quantity is the step)."""
    from opticalflowscivis_tpu.training.upflow_trainer import (
        UPFlowTrainConfig,
        UPFlowTrainer,
    )

    batch = 8
    cfg = UPFlowTrainConfig(batch_size=batch, exp_dir="/tmp/bench_upflow",
                            n_data=1, hbm_dataset_gb=0.0)
    tr = UPFlowTrainer(cfg)
    key = jax.random.PRNGKey(0)
    pairs = np.asarray(
        jax.random.uniform(key, (batch, 2, 256, 832, 3), jnp.float32))
    tr.init_state(pairs)
    dev = jax.device_put(
        {"im1": jnp.asarray(pairs[:, 0]), "im2": jnp.asarray(pairs[:, 1])},
        tr.batch_sharding,
    )
    state = tr.state
    rng = jax.random.PRNGKey(1)

    # Loop pattern (validated by scripts/fit_throughput_ab.py against the
    # real fit loops): thread the donated state step-to-step with a fresh
    # fold_in rng, materialize once at the end.  The state data dependency
    # forces real execution through the lazy relay; eps-chained timing of
    # this step reads ~2.4x slow (relay-chaining artifact, RESULTS.md).
    for i in range(2):  # warm/compile
        state, parts = tr._jit_train(state, dev, jax.random.fold_in(rng, i))
    float(parts["loss_total"])
    iters = 24
    t0 = time.perf_counter()
    for i in range(iters):
        state, parts = tr._jit_train(
            state, dev, jax.random.fold_in(rng, 100 + i))
    float(parts["loss_total"])
    sec = (time.perf_counter() - t0) / iters
    _DETAILS["upflow_train_vs_reference_9p8_pairs_per_sec"] = round(
        (batch / sec) / REFERENCE_TRAIN_PAIRS_PER_SEC, 3)
    return batch / sec


def main():
    if os.environ.get("BENCH_FORCE_CPU"):
        # Env JAX_PLATFORMS is not honored under the axon plugin; the config
        # update is the reliable CPU pin (CLAUDE.md).
        jax.config.update("jax_platforms", "cpu")
    pairs_per_sec, sec_per_call, flops_per_call = bench_rife2d_inference()
    peak = _peak_flops()
    if flops_per_call is None:
        # Fallback: XLA cost analysis of this exact forward on CPU reports
        # 3.354 GFLOP per 160x224 pair (measured once; conv stacks of 3
        # IFBlocks at scales 4/2/1).
        flops_per_call = 3.354e9 * BATCH
    mfu = (flops_per_call / sec_per_call) / peak

    print(json.dumps({
        "metric": "rife2d_inference_droplet2d_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(mfu, 4),
    }), flush=True)

    details = _DETAILS  # SIGALRM backstop dumps whatever is filled in so far
    details.update({
        "rife2d_inference_160x224_pairs_per_sec": round(pairs_per_sec, 2),
        "rife2d_inference_mfu": round(mfu, 4),
        "rife2d_inference_flops_per_call": flops_per_call,
        "device_kind": jax.devices()[0].device_kind,
        "assumed_peak_flops": peak,
        "note": "vs_baseline in the headline line is achieved MFU "
                "(no comparable reference inference number exists); the "
                "reference's only training anchor (9.8 pairs/s UPFlow) is "
                "compared like-for-like in "
                "upflow_train_vs_reference_9p8_pairs_per_sec. Protocol "
                "change (round 5): inference rates are measured with the "
                "eps-chain inside one jitted lax.scan (the chip's sustained "
                "rate); the r1-r4 per-dispatch protocol paid one ~45 ms "
                "relay RPC per call and is preserved as "
                "rife2d_inference_chained_relay_pairs_per_sec",
    })

    # Hard backstop: the headline is out — if any detail sub-bench wedges (the
    # relay can hang indefinitely, CLAUDE.md), exit 0 at the budget instead of
    # letting the driver's timeout turn a successful bench into rc=124.
    try:
        import signal

        signal.signal(signal.SIGALRM, _dump_and_exit)
        signal.alarm(max(int(_remaining()), 1))
    except Exception:  # noqa: BLE001 — platform without SIGALRM
        pass

    def run(name, fn, min_budget):
        if _remaining() < min_budget:
            details[name] = f"skipped: {_remaining():.0f}s budget left"
            return
        try:
            details[name] = round(fn(), 3)
        except Exception as e:  # noqa: BLE001 — record, never forfeit the bench
            details[name] = f"error: {e}"

    # 256^3 inference FIRST: it is the sub-bench closest to BASELINE.json's
    # 256^3 north-star and was starved by ordering in r03 ("skipped: 44s
    # budget left") — running it while the full budget remains protects it
    # (VERDICT r3 item 4).  Hours on CPU, so TPU-only.
    if jax.default_backend() != "cpu":
        run("rife3d_inference_256cube_vols_per_sec",
            lambda: bench_rife3d_inference(256, batch=1), 180)
    run("rife3d_inference_64cube_vols_per_sec",
        lambda: bench_rife3d_inference(64), 90)
    run("rife2d_train_128x128_pairs_per_sec", bench_train_step, 120)
    run("upflow_train_256x832_b8_pairs_per_sec", bench_upflow_train, 150)

    _write_details()
    print(json.dumps({"details": details}), file=sys.stderr)


_DETAILS: dict = {}


def _write_details():
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_details.json"), "w") as f:
        json.dump(_DETAILS, f, indent=2)


def _dump_and_exit(signum, frame):
    _DETAILS["aborted"] = "bench budget exhausted (SIGALRM)"
    _write_details()
    os._exit(0)


def _supervised():
    """Run the real bench in a child process and babysit device init.

    The axon relay can wedge so that PJRT client creation blocks forever
    (CLAUDE.md; round-1 BENCH artifact: rc=124 with zero output).  A hung
    in-process init cannot be cancelled, so the measurement runs in a child:
    if it emits no stdout within BENCH_INIT_DEADLINE_S it is killed and
    retried (wedges self-heal after minutes) while BENCH_SUPERVISE_BUDGET_S
    lasts.  After the first line (the headline JSON) the child polices its
    own budget (BUDGET_S + SIGALRM) and we just stream it through.
    """
    import selectors
    import subprocess

    deadline = float(os.environ.get("BENCH_INIT_DEADLINE_S", "420"))
    budget = float(os.environ.get("BENCH_SUPERVISE_BUDGET_S", "2400"))
    retry_sleep = 90.0
    t0 = time.perf_counter()
    attempt = 0
    env = dict(os.environ)
    env["BENCH_NO_SUPERVISE"] = "1"
    while True:
        attempt += 1
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            stdout=subprocess.PIPE, env=env,
        )
        sel = selectors.DefaultSelector()
        sel.register(child.stdout, selectors.EVENT_READ)
        got_output = False
        init_t0 = time.perf_counter()
        # Post-headline hard cap: the child's SIGALRM backstop cannot fire
        # while its main thread is wedged inside a blocking relay call, so the
        # parent enforces the budget too.  Headline already streamed → rc 0.
        hard_cap = BUDGET_S + 300.0
        while True:
            alive = time.perf_counter() - init_t0
            if not got_output and alive > deadline:
                break  # wedged init — kill and maybe retry
            if got_output and alive > hard_cap:
                child.kill()
                child.wait()
                sys.exit(0)
            if sel.select(timeout=5.0):
                data = os.read(child.stdout.fileno(), 65536)
                if not data:  # EOF — child finished
                    sys.exit(child.wait())
                sys.stdout.buffer.write(data)
                sys.stdout.flush()
                got_output = True
        child.kill()
        child.wait()
        remaining = budget - (time.perf_counter() - t0)
        if remaining < deadline + retry_sleep:
            print(
                f"bench: device init produced no output in {deadline:.0f}s "
                f"x{attempt} attempts (relay wedged?); budget exhausted",
                file=sys.stderr,
            )
            sys.exit(3)
        print(
            f"bench: init attempt {attempt} wedged; retrying in "
            f"{retry_sleep:.0f}s ({remaining:.0f}s budget left)",
            file=sys.stderr,
        )
        time.sleep(retry_sleep)


if __name__ == "__main__":
    if os.environ.get("BENCH_NO_SUPERVISE"):
        main()
    else:
        _supervised()
