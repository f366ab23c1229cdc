"""256^3 volumetric TRAINING — the capability the reference lacked.

The reference downsampled Droplet-3D from 256^3 to 64^3 because full volumes
did not fit its GPU training memory (Datasets/read_data.py:149-159); the
BASELINE.json north star asks for 256^3 throughput on one v5e chip.  Recipe
that fits one chip's 16 GB HBM:

- rematerialized IFBlocks (jax.checkpoint, ModelConfig.remat),
- bf16 HBM-resident dataset cache + on-device flip augmentation,
- batch 1 (data mesh axis 1 on a single chip).

Reports seconds/step (vols/s) for the jitted train step and runs a short
schedule, writing Results_256/train256_report.json.  Run on the TPU chip:

    python scripts/train256.py [--frames 33] [--epochs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=33)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--grid", type=int, default=256)
    ap.add_argument("--out", default="Results_256")
    ap.add_argument("--device_gen", type=int, default=0, metavar="N",
                    help="generate N FRESH tuples per epoch ON DEVICE "
                         "(box-mask synthesis from host int positions, "
                         "data/device_synthetic.py) instead of an 8-tuple "
                         "HBM-resident upload — the relay-bandwidth fix for "
                         "'192^3 memorizes its dataset'")
    ap.add_argument("--val_tuples", type=int, default=8,
                    help="held-out seed-7 tuples for the PSNR quality row "
                         "(VERDICT r4 #3 asks >=32 with per-tuple spread)")
    ap.add_argument("--coarse_final", action="store_true",
                    help="single-chip 256^3 mode: run the final IFBlock at "
                         "scale 2 (4,2,2) so no conv consumes a full-res "
                         "input; warps, merge and losses stay at full res")
    ap.add_argument("--resume", action="store_true",
                    help="restore the run's checkpoint before training "
                         "(continue a budget-killed schedule)")
    ap.add_argument("--eval_only", action="store_true",
                    help="skip training: restore the run's checkpoint and "
                         "compute the quality row + report (for runs whose "
                         "budget timeout killed the tail of the schedule)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (jax.config, not env vars — "
                         "the axon sitecustomize can override the latter); "
                         "for the small-grid coarse_final A-B runs")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from opticalflowscivis_tpu.data import group_tuples
    from opticalflowscivis_tpu.data.synthetic import rectangle_3d
    from opticalflowscivis_tpu.losses.rife import RIFELossWeights
    from opticalflowscivis_tpu.training import ModelConfig, TrainConfig, Trainer

    g = args.grid
    grid, box = (g, g, g), (g // 4, g // 4, g // 4)
    tuples = None
    if args.eval_only and not args.device_gen:
        # eval_only never reads host tuples (the quality row is re-stamped
        # from seed-7 positions below) — generating --frames at grid^3 here
        # costs minutes-to-hours for an unused array (ADVICE r3)
        n = 0
        print("eval_only: skipping host data generation", flush=True)
    elif not args.device_gen:
        print(f"generating {args.frames} frames of {g}^3 ...", flush=True)
        t0 = time.time()
        # density-only: the unsupervised 3-D recipe never reads GT flow, and
        # at 256^3 the flow channels quadruple host prep cost and overflow the
        # HBM dataset budget (4-ch bf16 tuples = 12.5 GB > 11 GB -> silent
        # fallback to the ~2 MB/s streamed path)
        arr = rectangle_3d(n_frames=args.frames, grid=grid,
                           box=box, seed=11, with_flow=False)
        tuples = group_tuples(arr, 1).astype(np.float32, copy=False)
        del arr
        n = tuples.shape[0]
        n_train = max(n - 2, 1)
        print(f"{n} tuples ({tuples.nbytes/1e9:.1f} GB host f32) "
              f"in {time.time()-t0:.0f}s", flush=True)
    else:
        n = args.device_gen
        print(f"device-gen: {n} fresh on-device tuples/epoch at {g}^3 "
              f"({n * 3 * g**3 * 4 / 1e9:.1f} GB/epoch that never crosses "
              "the relay)", flush=True)

    cfg = TrainConfig(
        dataset="rectangle3d",
        batch_size=1,
        epochs=args.epochs,
        model=ModelConfig.preset_3d(
            remat=True,
            **({"scales": (4, 2, 2), "teacher_scale": 2}
               if args.coarse_final else {}),
        ),
        loss=RIFELossWeights.preset_3d(),
        data_dir="/tmp/t256_d", log_dir=os.path.join(args.out, "log"),
        results_dir=args.out,
        device_flip_aug=True,
        hbm_dataset_dtype="bfloat16",
        hbm_dataset_gb=11.0,
        keep_best_only=False,
        # At 256^3 XLA's remat-compression pass stores the [*, 6]-channel flow
        # tensors in a "compressed" layout that actually pads 21.3x (four 4 GB
        # buffers of 192 MB data -> OOM).  Our explicit jax.checkpoint remat
        # already covers the blocks and warp taps; disable XLA's own pass.
        compiler_options=(
            {"xla_tpu_rematerialization_min_size_in_bytes": "1000000000000"}
            if g >= 256 else None
        ),
    )
    tr = Trainer(cfg)

    report = {"grid": g, "n_tuples": int(n)}
    t0 = time.time()
    if args.eval_only:
        from opticalflowscivis_tpu.data.device_synthetic import tuple_positions

        val_pos = tuple_positions(np.random.default_rng(7), args.val_tuples, grid, box)
        sample = np.zeros((1, 3) + grid + (1,), np.float32)
        tr.init_state(sample, 1)
        assert tr.load_checkpoint(), "no checkpoint to restore"
        lj = os.path.join(tr.results_dir, "loss.json")
        if os.path.exists(lj):
            vh = json.load(open(lj))["val_loss"]
            report.update(epochs_completed=len(vh),
                          val_loss_first=vh[0][0], val_loss_final=vh[-1][0])
        hist = []
        wall = 0.0
    elif args.device_gen:
        from opticalflowscivis_tpu.data.device_synthetic import (
            box_density_device,
            tuple_positions,
        )

        def gen(pos):
            return box_density_device(pos, grid, box)

        def pos_sampler(epoch):
            rng = np.random.default_rng(10_000 + epoch)
            pos = tuple_positions(rng, n, grid, box)
            # shuffle: trajectory order holds one velocity for up to
            # max_seq frames, starving per-batch motion diversity (ADVICE r3)
            return pos[rng.permutation(n)]

        val_pos = tuple_positions(np.random.default_rng(7), args.val_tuples, grid, box)
        report["device_gen"] = True
        hist = tr.fit_device_gen(gen, pos_sampler, val_pos,
                                 steps_per_epoch=n, log_every=10,
                                 resume=args.resume)
    else:
        hist = tr.fit(tuples[:n_train], tuples[n_train:], log_every=1,
                      resume=args.resume)
    if hist:
        wall = time.time() - t0
        steps = tr.steps_per_epoch * args.epochs
        report.update(
            seconds_per_step=round(wall / max(steps, 1), 3),
            train_vols_per_sec=round(steps * 1 / wall, 4),
            epochs=args.epochs,
            steps=steps,
            val_loss_first=hist[0]["loss_G"],
            val_loss_final=hist[-1]["loss_G"],
        )
    # quality row (VERDICT r2 item 5): interp PSNR on val vs the copy-frame
    # and linear-average trivial baselines — 'learning', not just 'stepping'
    def _psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        return float(10 * np.log10(1.0 / max(mse, 1e-12)))

    if args.device_gen or args.eval_only:
        # host-stamp the val tuples from positions (oracle-identical to the
        # device gen; avoids a 680 MB D2H pull over the relay).  NOTE for
        # eval_only of a non-device-gen run: this seed-7 val differs from the
        # tuples[n_train:] split its loss.json used — record which set the
        # PSNR row came from (ADVICE r3).
        report["val_set"] = "seed7_positions"
        val = np.zeros((val_pos.shape[0], 3) + grid + (1,), np.float32)
        for i in range(val_pos.shape[0]):
            for s in range(3):
                sl = tuple(slice(p, p + b) for p, b in zip(val_pos[i, s], box))
                val[(i, s) + sl + (0,)] = 1.0
    else:
        report["val_set"] = "tuples_tail"
        val = tuples[n_train:]
    preds = []
    for i in range(val.shape[0]):  # batch 1: the eval fwd must fit like train
        _, extras = tr.predict(val[i : i + 1])
        preds.append(np.asarray(extras["pred"], np.float32)[..., :1])
    pred = np.concatenate(preds, axis=0)
    gt = val[:, 2, ..., :1]
    f0, f1 = val[:, 0, ..., :1], val[:, 1, ..., :1]
    report.update(
        val_psnr_model=round(_psnr(pred, gt), 3),
        val_psnr_copy_frame=round(_psnr(f0, gt), 3),
        val_psnr_linear=round(_psnr((f0 + f1) / 2, gt), 3),
    )
    # per-tuple PSNR mean +/- spread (VERDICT r4 #3: a +0.09 dB aggregate
    # margin over linear is meaningless without the per-tuple variance)
    per = {"model": [], "copy": [], "linear": []}
    for i in range(val.shape[0]):
        per["model"].append(_psnr(pred[i], gt[i]))
        per["copy"].append(_psnr(f0[i], gt[i]))
        per["linear"].append(_psnr((f0[i] + f1[i]) / 2, gt[i]))
    diff = np.asarray(per["model"]) - np.asarray(per["linear"])
    report["per_tuple_psnr"] = {
        k: {"mean": round(float(np.mean(v)), 3),
            "std": round(float(np.std(v)), 3),
            "values": [round(float(x), 3) for x in v]}
        for k, v in per.items()
    }
    report["model_minus_linear_db"] = {
        "mean": round(float(diff.mean()), 3),
        "std": round(float(diff.std()), 3),
        "min": round(float(diff.min()), 3),
        "frac_tuples_model_wins": round(float((diff > 0).mean()), 3),
    }
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        report["hbm_peak_bytes"] = int(stats.get("peak_bytes_in_use", 0))
    except Exception:  # noqa: BLE001
        pass
    if not report.get("hbm_peak_bytes"):
        # relay may not expose live memory_stats; record the compiler's own
        # peak-memory analysis of the jitted train step instead (a real
        # number, not the r4 report's 0)
        try:
            mem = tr._jit_train.lower(
                tr.state,
                jax.device_put(
                    np.zeros((1, 3) + grid + (1,), np.float32),
                    tr.batch_sharding,
                ),
            ).compile().memory_analysis()
            report["hbm_compiletime_bytes"] = {
                "temp": int(getattr(mem, "temp_size_in_bytes", 0)),
                "argument": int(getattr(mem, "argument_size_in_bytes", 0)),
                "output": int(getattr(mem, "output_size_in_bytes", 0)),
            }
        except Exception as e:  # noqa: BLE001
            report["hbm_compiletime_bytes"] = {"error": repr(e)}
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "train256_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
