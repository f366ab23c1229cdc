"""Where the UPFlow train step's time goes — component decomposition.

VERDICT r2 established the anchor (reference UPFlow trains at ~9.8 pairs/s,
`/root/reference/UPFlow/scripts/simple_train.py:56-59`); the r3 roofline put
our b8 256x832 train step at ~1.40 s/call device time (5.7 pairs/s) with XLA
cost analysis claiming 1.47 TB touched — clearly bandwidth-dominated.  This
script answers *which component* is burning the bytes: it compiles the full
step plus isolated sub-graphs (forward only, loss-only, per-level cost volume
fwd+grad on both backends, census, occ_check, full-res warps) at the same
shapes and reports each one's wall time (relay-chained, varied inputs —
CLAUDE.md timing discipline) and XLA flops/bytes.

Usage: python scripts/upflow_profile.py [out.json] [--iters N]
On CPU it reports cost analysis only (wall times there mean nothing for TPU).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:  # config update, not env — axon overrides env pins
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

ITERS = 10
B, H, W = 8, 256, 832


def _chain(fn, args, iters):
    """Chained, varied-input timing (the relay caches identical calls)."""
    s = jnp.float32(0.0)
    float(fn(s, *args))  # warm/compile
    s = jnp.float32(1e-6)
    t0 = time.perf_counter()
    for i in range(iters):
        s = fn(s + i * 1e-5, *args)
    float(s)
    return (time.perf_counter() - t0) / iters


def _cost(jitted, *args):
    shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), args
    )
    c = jitted.lower(*shapes).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "Results/upflow_profile.json"
    iters = ITERS
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    on_tpu = jax.default_backend() == "tpu"

    from opticalflowscivis_tpu.losses.upflow import upflow_losses
    from opticalflowscivis_tpu.ops import (
        backward_warp,
        census_loss,
        cost_volume,
        occ_check,
    )
    from opticalflowscivis_tpu.training.upflow_trainer import (
        UPFlowTrainConfig,
        UPFlowTrainer,
    )

    cfg = UPFlowTrainConfig(batch_size=B, exp_dir="/tmp/prof_upflow",
                            n_data=1, hbm_dataset_gb=0.0)
    tr = UPFlowTrainer(cfg)
    key = jax.random.PRNGKey(0)
    pairs = np.asarray(jax.random.uniform(key, (B, 2, H, W, 3), jnp.float32))
    tr.init_state(pairs)
    im1 = jnp.asarray(pairs[:, 0])
    im2 = jnp.asarray(pairs[:, 1])
    rng = jax.random.PRNGKey(1)
    results = {"backend": jax.default_backend(), "batch": B, "hw": [H, W],
               "iters": iters}

    def _dump():
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        with open(out, "w") as f:
            json.dump(results, f, indent=2)

    def bench(name, make_fn, *args):
        """make_fn(eps, *args) -> scalar; jit, time (TPU), cost-analyze."""
        jitted = jax.jit(make_fn)
        try:
            flops, bytes_ = _cost(jitted, jnp.float32(0.0), *args)
        except Exception as e:  # noqa: BLE001
            flops = bytes_ = float("nan")
            print(f"{name}: cost analysis failed: {e}", flush=True)
        entry = {"flops": flops, "bytes": bytes_}
        if on_tpu:
            entry["wall_s"] = _chain(jitted, args, iters)
        results[name] = entry
        w = f", wall {entry.get('wall_s', 0)*1e3:8.1f} ms" if on_tpu else ""
        print(f"{name:34s} F={flops/1e9:9.2f} GF  B={bytes_/1e9:9.2f} GB{w}",
              flush=True)
        _dump()  # incremental: remote compiles are slow; keep partials

    # 1. full train step (fwd+bwd+adamw) — state is donated in the real path;
    #    here keep it un-donated so the chain can reuse it.
    state0 = tr.state

    def full_step(eps, s, a, b):
        batch = {"im1": a + eps, "im2": b + eps}
        new_state, parts = tr._train_step(s, batch, rng)
        return parts["loss_total"] * 1e-6 + 0.0 * new_state.step

    bench("train_step_full", full_step, state0, im1, im2)

    # 1b. the same step timed exactly like the real training loop: donated
    #     state threaded through tr._jit_train back-to-back, batch constant,
    #     materialize once at the end.  Compares against the eps-chained
    #     pattern above to expose any methodology gap (roofline r3 read
    #     5.7 pairs/s chained while fit_kitti_hbm sustains ~12 pairs/s).
    if on_tpu:
        batch_dev = jax.device_put({"im1": im1, "im2": im2}, tr.batch_sharding)
        st = jax.device_put(tr.state, tr.repl)
        st, parts = tr._jit_train(st, batch_dev, rng)  # warm (already compiled)
        float(parts["loss_total"])
        n_loop = max(iters, 10)
        t0 = time.perf_counter()
        for i in range(n_loop):
            st, parts = tr._jit_train(
                st, batch_dev, jax.random.fold_in(rng, i))
        float(parts["loss_total"])
        loop_s = (time.perf_counter() - t0) / n_loop
        results["train_loop_jit_train"] = {
            "wall_s": loop_s, "pairs_per_sec": B / loop_s}
        print(f"{'train_loop_jit_train':34s} wall {loop_s*1e3:8.1f} ms "
              f"({B/loop_s:.2f} pairs/s)", flush=True)
        _dump()
        tr.init_state(pairs)  # st consumed the donated state; rebuild
        state0 = tr.state

    # 2. loss_fn value_and_grad only (no optimizer update)
    def fwd_bwd(eps, params, a, b):
        def loss_fn(p):
            o = tr.net.apply(p, a + eps, b + eps)
            t, _ = upflow_losses(o, a + eps, b + eps, cfg.loss)
            return t

        l, g = jax.value_and_grad(loss_fn)(params)
        return l * 1e-6 + jax.tree.reduce(
            lambda acc, x: acc + jnp.sum(jnp.abs(x).astype(jnp.float32)) * 1e-12,
            g, jnp.float32(0.0))

    bench("loss_value_and_grad", fwd_bwd, state0.params, im1, im2)

    # 3. net forward only
    def fwd_only(eps, params, a, b):
        o = tr.net.apply(params, a + eps, b + eps)
        return jnp.sum(o["flow_f"].astype(jnp.float32)) * 1e-9

    bench("net_forward_only", fwd_only, state0.params, im1, im2)

    # 4. losses only, differentiated wrt the model outputs (flow pyramid)
    out0 = jax.jit(tr.net.apply)(state0.params, im1, im2)

    def loss_only(eps, o, a, b):
        def lf(oo):
            t, _ = upflow_losses(oo, a, b, cfg.loss)
            return t

        oo = jax.tree.map(lambda x: x + eps.astype(x.dtype), o)
        l, g = jax.value_and_grad(lf)(oo)
        return l * 1e-6 + jnp.sum(g["flow_f"].astype(jnp.float32)) * 1e-12

    bench("losses_fwd_bwd_wrt_flows", loss_only, out0, im1, im2)

    # 5. cost volume fwd+grad per pyramid level, both backends.  Level shapes
    #    for 256x832 input: (1/4..1/64 scale) x (ch 32..196), bidirectional in
    #    the real net — here one direction, x2 to compare.
    levels = [  # (h, w, c) finest decoded -> coarsest
        (H // 4, W // 4, 32),
        (H // 8, W // 8, 64),
        (H // 16, W // 16, 96),
        (H // 32, W // 32, 128),
        (H // 64, W // 64, 196),
    ]
    for h, w, c in levels:
        f1 = jax.random.uniform(jax.random.fold_in(key, h), (B, h, w, c),
                                jnp.bfloat16)
        f2 = jax.random.uniform(jax.random.fold_in(key, h + 1), f1.shape,
                                f1.dtype)
        for backend in (("pallas", "jnp") if on_tpu else ("jnp",)):
            def cv(eps, a, b, _backend=backend):
                def f(x, y):
                    return jnp.sum(
                        cost_volume(x, y, 4, backend=_backend).astype(
                            jnp.float32)) * 1e-9

                l, g = jax.value_and_grad(f, argnums=(0, 1))(
                    a + eps.astype(a.dtype), b)
                return l + jnp.sum(g[0].astype(jnp.float32)) * 1e-12

            bench(f"costvol_{backend}_{h}x{w}x{c}", cv, f1, f2)

    # 6. census loss pair (both directions' terms) fwd+grad wrt warped images
    def census_pair(eps, a, b):
        def f(x):
            return census_loss(a, x, robust=True)

        l, g = jax.value_and_grad(f)(b + eps)
        return l * 1e-6 + jnp.sum(g.astype(jnp.float32)) * 1e-12

    bench("census_fullres_fwd_bwd", census_pair, im1, im2)

    # 7. occ_check fwd+grad wrt both flows
    ff = jax.random.normal(jax.random.fold_in(key, 7), (B, H, W, 2), jnp.float32)
    fb = -ff + 0.1 * jax.random.normal(jax.random.fold_in(key, 8), ff.shape)

    def occ(eps, a, b):
        def f(x, y):
            m1, m2 = occ_check(x, y)
            return jnp.sum(m1) * 1e-9 + jnp.sum(m2) * 1e-9

        l, g = jax.value_and_grad(f, argnums=(0, 1))(a + eps, b)
        return l + jnp.sum(g[0]) * 1e-12

    bench("occ_check_fullres_fwd_bwd", occ, ff, fb)

    # 8. full-res photometric warp fwd+grad (border padding, as in the loss)
    def warp(eps, img, fl):
        def f(x):
            return jnp.sum(backward_warp(img, x, padding="border")) * 1e-9

        l, g = jax.value_and_grad(f)(fl + eps)
        return l + jnp.sum(g) * 1e-12

    bench("warp_fullres_fwd_bwd", warp, im2, ff)

    # attribution summary: components as fraction of the full step
    full = results["train_step_full"]
    for k, v in results.items():
        if isinstance(v, dict) and "bytes" in v and k != "train_step_full":
            v["bytes_frac_of_step"] = (
                round(v["bytes"] / full["bytes"], 4) if full["bytes"] else None
            )
            if on_tpu and "wall_s" in v and "wall_s" in full:
                v["wall_frac_of_step"] = round(v["wall_s"] / full["wall_s"], 4)

    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
