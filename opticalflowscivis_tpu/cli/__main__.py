"""CLI dispatcher — ``python -m opticalflowscivis_tpu.cli <verb> [flags]``.

Flags follow the reference argparse surfaces (Flow-2D/train.py:556-564,
inference_video.py:394-409) with the code-as-config knobs promoted to flags.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--dataset", default="rectangle2d")
    p.add_argument("--exp", type=int, default=1, help="interpolate 2**exp x")
    p.add_argument("--data_dir", default="data_cache")
    p.add_argument("--results_dir", default="Results")
    p.add_argument("--log_dir", default="train_log")
    p.add_argument("--model_name", default="flownet")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--config_json", default=None,
                   help="path to a TrainConfig json overriding flags")


def _maybe_cpu(args):
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")


def _build_cfg(args, epochs=None, batch_size=None):
    from opticalflowscivis_tpu.data import get_spec
    from opticalflowscivis_tpu.losses.rife import RIFELossWeights
    from opticalflowscivis_tpu.training import ModelConfig, TrainConfig

    if args.config_json:
        with open(args.config_json) as f:
            return TrainConfig.from_json(f.read())
    spec = get_spec(args.dataset)
    if spec.ndim == 3:
        # remat: a 64^3 train step at useful batch sizes exceeds one chip's
        # HBM without rematerializing the IFBlocks (SURVEY.md §7 risks)
        model = ModelConfig.preset_3d(remat=True)
        loss = RIFELossWeights.preset_3d()
    else:
        model = ModelConfig.preset_2d()
        loss = RIFELossWeights.preset_2d(
            flow_supervised=getattr(args, "flow_supervised", False)
        )
    if getattr(args, "distill", None) is not None:
        import dataclasses as _dc

        loss = _dc.replace(loss, distill=args.distill)
    return TrainConfig(
        dataset=args.dataset,
        exp=args.exp,
        epochs=epochs if epochs is not None else getattr(args, "epochs", 300),
        batch_size=batch_size if batch_size is not None else getattr(args, "batch_size", None),
        data_dir=args.data_dir,
        results_dir=args.results_dir,
        log_dir=args.log_dir,
        model_name=args.model_name,
        model=model,
        loss=loss,
        early_stop_patience=1000 if spec.ndim == 3 else 0,  # Flow-3D/train.py:400-412
        keep_best_only=spec.ndim == 3,
        # On-device flip augmentation whenever the dataset flips: bit-equal to
        # the host augmentation (tested) with 4x fewer HBM-cached bytes, which
        # keeps large 2-D sets (vortex2d: 11.4 GB augmented) device-resident
        # instead of falling back to relay streaming (~22x slower).  3-D adds
        # the bf16 cache (the host-augmented f32 64^3 set would be ~38 GB).
        device_flip_aug=spec.flip_aug,
        hbm_dataset_dtype="bfloat16" if spec.ndim == 3 else "float32",
    )


def cmd_train(argv):
    p = argparse.ArgumentParser(prog="train")
    _add_common(p)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--flow_supervised", action="store_true")
    p.add_argument("--distill", type=float, default=None,
                   help="override distill lambda (reference: 0.01 2-D "
                        "RIFE.py:283-289, 0.1 3-D Flow-3D/model/RIFE.py:241; "
                        "3-D default here is 0 — see preset_3d deviation note)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--vimeo_root", default=None,
                   help="Vimeo90K triplet root (required for --dataset vimeo2d)")
    p.add_argument("--steps_per_epoch", type=int, default=0,
                   help="streamed datasets (vimeo2d): steps per epoch "
                        "(0 = len(dataset) // batch)")
    args = p.parse_args(argv)
    _maybe_cpu(args)

    from opticalflowscivis_tpu.training import Trainer

    cfg = _build_cfg(args)
    tr = Trainer(cfg)
    if args.dataset == "vimeo2d":
        # streamed triplets w/ per-step random crops (train.py:78-100)
        if not args.vimeo_root:
            raise SystemExit("--dataset vimeo2d requires --vimeo_root")
        from opticalflowscivis_tpu.data.vimeo import VimeoDataset

        batch = cfg.batch_size or 16
        ds = VimeoDataset(args.vimeo_root, split="train")
        ds_val = VimeoDataset(args.vimeo_root, split="test")
        spe = args.steps_per_epoch or max(len(ds) // batch, 1)
        val = ds_val.sample(min(len(ds_val), 4 * batch))
        print(f"vimeo: {len(ds)} train triplets, val {val.shape}", flush=True)
        hist = tr.fit_stream(lambda: ds.sample(batch), val, spe,
                             resume=args.resume)
    else:
        train, val = tr.load_datasets()
        print(f"train tuples {train.shape}, val tuples {val.shape}", flush=True)
        hist = tr.fit(train, val, resume=args.resume)
    print(json.dumps({"final_val": hist[-1] if hist else None}), flush=True)


def cmd_test(argv):
    p = argparse.ArgumentParser(prog="test")
    _add_common(p)
    p.add_argument("--batch_size", type=int, default=16)
    args = p.parse_args(argv)
    _maybe_cpu(args)

    import jax.numpy as jnp

    from opticalflowscivis_tpu.data import get_spec, load_data, pad_to_multiple
    from opticalflowscivis_tpu.evalsuite import calculate_diff, calculate_metrics
    from opticalflowscivis_tpu.inference import Interpolator, batched_pair_inference
    from opticalflowscivis_tpu.losses import epe
    from opticalflowscivis_tpu.training import Trainer
    from opticalflowscivis_tpu.viz import plot_loss, visualize_large

    cfg = _build_cfg(args)
    spec = get_spec(args.dataset)
    tr = Trainer(cfg)
    test = load_data(args.dataset, args.exp, "test", args.data_dir)
    padded, _ = pad_to_multiple(test, cfg.pad_multiple, leading_axes=2)
    tr.init_state(padded[: min(args.batch_size, padded.shape[0])], total_steps=1)
    tr.load_checkpoint()

    interp = Interpolator(tr.model, tr.state.params, cfg.pad_multiple)
    res = batched_pair_inference(interp, test[..., :1], args.batch_size)
    diffs = calculate_diff(res["gt"], res["pred"])
    psnr, ssim_v = calculate_metrics(
        res["gt"][..., 0] * 255.0, res["pred"][..., 0] * 255.0, factor=2**31
    )  # factor huge → every frame counts as interpolated
    report = {"psnr": psnr, "ssim": ssim_v}

    flow_gt = None
    if spec.has_flow:
        flow_gt = test[:, 2, ..., 1 : 1 + spec.ndim] * spec.gt_flow_stride
        ndim = spec.ndim
        report["epe_ft1"] = float(epe(jnp.asarray(res["flow"][..., ndim:]),
                                      jnp.asarray(flow_gt)))
        report["epe_ft0"] = float(epe(jnp.asarray(res["flow"][..., :ndim]),
                                      jnp.asarray(-flow_gt)))

    dir_res = tr.results_dir
    os.makedirs(dir_res, exist_ok=True)
    if spec.ndim == 2:
        visualize_large(
            res["gt"], res["pred"], diffs, res["mask"],
            flow_gt, res["flow"][..., spec.ndim:] if spec.has_flow else None,
            dir_res, title="test_panel",
        )
    else:  # 3-D: mid-depth slice panel + volume render (Flow-3D/train.py:287-316)
        from opticalflowscivis_tpu.viz import visualize_3d, visualize_large_3d

        visualize_large_3d(res["gt"][..., 0], res["pred"][..., 0],
                           diffs[..., 0], dir_res, title="test_panel3d")
        visualize_3d(res["pred"][0, ..., 0], dir_res, title="pred_volume")
    loss_json = os.path.join(dir_res, "loss.json")
    if os.path.exists(loss_json):
        plot_loss(loss_json, dir_res)
    with open(os.path.join(dir_res, "test_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report), flush=True)


def cmd_inference_img(argv):
    p = argparse.ArgumentParser(prog="inference_img")
    _add_common(p)
    p.add_argument("--img0", required=True)
    p.add_argument("--img1", required=True)
    p.add_argument("--out_dir", default="interp_out")
    p.add_argument("--n_exp", type=int, default=1, help="insert 2**n_exp - 1 frames")
    p.add_argument("--ratio", type=float, default=0.0,
                   help="single frame at this time ratio (0 = use n_exp)")
    p.add_argument("--zoo_dir", default="",
                   help="pretrained RIFE HD/HDv2/HDv3 checkpoint dir (torch "
                        "pkl files) instead of a framework checkpoint")
    args = p.parse_args(argv)
    _maybe_cpu(args)

    from opticalflowscivis_tpu.cli.io_utils import load_image, save_image
    from opticalflowscivis_tpu.inference import (
        Interpolator,
        interpolate_ratio,
        interpolate_recursive,
        load_pretrained_zoo,
    )
    from opticalflowscivis_tpu.training import Trainer

    img0 = load_image(args.img0)
    img1 = load_image(args.img1)
    if args.zoo_dir:
        interp = load_pretrained_zoo(args.zoo_dir)
    else:
        cfg = _build_cfg(args, epochs=1)
        tr = Trainer(cfg)
        sample = np.stack([img0, img1, img0])[None]
        tr.init_state(sample, total_steps=1)
        tr.load_checkpoint()
        interp = Interpolator(tr.model, tr.state.params, cfg.pad_multiple)
    if args.ratio > 0:
        mids = [interpolate_ratio(interp, img0[None], img1[None], args.ratio)]
    else:
        mids = interpolate_recursive(interp, img0[None], img1[None],
                                     2**args.n_exp - 1)
    os.makedirs(args.out_dir, exist_ok=True)
    save_image(img0, os.path.join(args.out_dir, "img0.png"))
    for i, m in enumerate(mids):
        save_image(m[0], os.path.join(args.out_dir, f"img{i+1}.png"))
    save_image(img1, os.path.join(args.out_dir, f"img{len(mids)+1}.png"))
    print(f"wrote {len(mids) + 2} frames to {args.out_dir}", flush=True)


def cmd_inference_video(argv):
    p = argparse.ArgumentParser(prog="inference_video")
    _add_common(p)
    p.add_argument("--factors", default="2,4,8,16,32,64,128")
    p.add_argument("--max_frames", type=int, default=0,
                   help="limit test frames (0 = all)")
    p.add_argument("--write_mp4", action="store_true")
    p.add_argument("--tta", action="store_true",
                   help="flip-averaged test-time augmentation (RIFE.py:66-78)")
    p.add_argument("--zoo_dir", default="",
                   help="pretrained RIFE HD/HDv2/HDv3 checkpoint dir (torch "
                        "pkl files) instead of a framework checkpoint")
    args = p.parse_args(argv)
    _maybe_cpu(args)

    from opticalflowscivis_tpu.cli.io_utils import write_video
    from opticalflowscivis_tpu.data import get_spec
    from opticalflowscivis_tpu.data.registry import load_raw_series
    from opticalflowscivis_tpu.evalsuite import (
        calculate_metrics,
        linear_interpolation_baseline,
    )
    from opticalflowscivis_tpu.inference import (
        Interpolator,
        interpolate_series,
        load_pretrained_zoo,
    )
    from opticalflowscivis_tpu.training import Trainer

    cfg = _build_cfg(args, epochs=1)
    spec = get_spec(args.dataset)
    frames = load_raw_series(args.dataset, args.data_dir, "test")[..., :1]
    if args.max_frames:
        frames = frames[: args.max_frames]

    if args.zoo_dir:
        interp = load_pretrained_zoo(args.zoo_dir)
    else:
        tr = Trainer(cfg)
        sample = np.stack([frames[0], frames[1], frames[0]])[None]
        tr.init_state(sample, total_steps=1)
        tr.load_checkpoint()
        interp = Interpolator(tr.model, tr.state.params, cfg.pad_multiple,
                              tta=args.tta)

    results = {}
    for factor in [int(f) for f in args.factors.split(",")]:
        if frames.shape[0] < factor + 1:
            break
        recon, _ = interpolate_series(interp, frames, factor)
        n = recon.shape[0]
        psnr, ssim_v = calculate_metrics(
            frames[:n, ..., 0] * 255.0, recon[..., 0] * 255.0, factor
        )
        base = linear_interpolation_baseline(frames[:n], factor)
        psnr_b, ssim_b = calculate_metrics(
            frames[:n, ..., 0] * 255.0, base[..., 0] * 255.0, factor
        )
        results[factor] = {
            "psnr": round(psnr, 2), "ssim": round(ssim_v, 4),
            "psnr_linear_baseline": round(psnr_b, 2),
            "ssim_linear_baseline": round(ssim_b, 4),
        }
        print(f"factor {factor}x: {results[factor]}", flush=True)
        if args.write_mp4:
            out = os.path.join(
                cfg.results_dir, args.dataset,
                f"{args.dataset}_10fps_extract{factor}x_{factor}X_{factor*10}fps.mp4",
            )
            write_video(recon[..., 0], out, fps=factor * 10)
    dir_res = os.path.join(cfg.results_dir, args.dataset)
    os.makedirs(dir_res, exist_ok=True)
    with open(os.path.join(dir_res, "interp_report.json"), "w") as f:
        json.dump(results, f, indent=2)
    if results:
        from opticalflowscivis_tpu.viz import plot_factor_comparison

        plot_factor_comparison(results, dir_res)
    print(json.dumps(results), flush=True)


def cmd_train_upflow(argv):
    p = argparse.ArgumentParser(prog="train_upflow")
    _add_common(p)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--census_weight", type=float, default=0.0)
    p.add_argument("--msd_weight", type=float, default=0.0)
    p.add_argument("--photo_loss_type", default="abs_robust",
                   choices=["abs_robust", "charbonnier", "L1", "SSIM"],
                   help="photometric penalty (upflow.py:267-289; SSIM = "
                        "weighted-SSIM, a wider basin for global shifts)")
    p.add_argument("--photo_use_occ", action="store_true",
                   help="occlusion-normalize photo/census "
                        "(photo_loss_use_occ, upflow.py:506-534)")
    p.add_argument("--smooth1_weight", type=float, default=1.0,
                   help="edge-aware 1st-order smoothness (upflow.py:304 "
                        "default 1). Measured (round 3 overfit grid): on "
                        "localized-motion data w/ static textured background "
                        "weight 1.0 pins flow at zero — the box-boundary flow "
                        "edges cost more than photo+census reward the match; "
                        "0 + census=1 converges to GT")
    p.add_argument("--lr", type=float, default=None,
                   help="Adam lr (default: recipe's own — 1e-4 for simple, "
                        "simple_train.py:146; 1e-2 for ex_runner, ex_runner.py:26)")
    p.add_argument("--grad_clip", type=float, default=0.0,
                   help="global-norm gradient clip (0 = off; required for "
                        "lr >= 1e-3 — unclipped, pan8 flow explodes to "
                        "~250 px within one epoch)")
    p.add_argument("--ckpt_every", type=int, default=1,
                   help="save the checkpoint every K epochs (a save is a full "
                        "params+opt D2H over the slow relay; raise for "
                        "short device-gen epochs)")
    p.add_argument("--exp_name", default="",
                   help="suffix for the run dir (Results/<ds>/upflow_<name>) "
                        "so A-B arms don't clobber the baseline run's "
                        "checkpoint/loss.json")
    p.add_argument("--sgu", action="store_true",
                   help="self-guided upsampling (if_sgu_upsample=True — the "
                        "reference's headline novelty, upflow.py:21-93)")
    p.add_argument("--recipe", default="simple", choices=["simple", "ex_runner"],
                   help="simple = scripts/simple_train.py; ex_runner = "
                        "scripts/ex_runner.py (eq/oi spatial-transform distill)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--device_gen", type=int, default=0, metavar="PAIRS",
                   help="pan datasets: train on PAIRS device-generated pairs "
                        "per epoch from a FRESH pan scene every epoch "
                        "(frames composed on the TPU from int positions, "
                        "data/device_synthetic.py) — unbounded data instead "
                        "of the fixed 3000-frame export")
    p.add_argument("--kitti_image_dir", default=None,
                   help="KITTI multiview image dir (with --dataset kitti): "
                        "random crops + boundary-dilated warping")
    p.add_argument("--steps_per_epoch", type=int, default=0,
                   help="KITTI path: steps per epoch (0 = len(pairs) // batch)")
    p.add_argument("--hbm_cache", type=int, default=1000,
                   help="KITTI path: pairs decoded once into HBM with "
                        "on-device crops/aug (0 = stream per step via host "
                        "prefetch threads — needs fast host↔device link)")
    p.add_argument("--prefetch_workers", type=int, default=2,
                   help="KITTI streamed path: host prefetch threads "
                        "(⇔ the reference's 8 DataLoader workers + "
                        "data_prefetcher, tools.py:177-249)")
    args = p.parse_args(argv)
    _maybe_cpu(args)

    from opticalflowscivis_tpu.losses.upflow import UPFlowLossConfig
    from opticalflowscivis_tpu.training.upflow_trainer import (
        UPFlowTrainConfig,
        UPFlowTrainer,
        frames_to_pairs,
    )

    kw = dict(
        batch_size=args.batch_size,
        n_epoch=args.epochs,
        grad_clip=args.grad_clip,
        ckpt_every=args.ckpt_every,
        exp_dir=os.path.join(
            args.results_dir, args.dataset,
            "upflow" if not args.exp_name else f"upflow_{args.exp_name}",
        ),
        loss=UPFlowLossConfig(census_weight=args.census_weight,
                              msd_weight=args.msd_weight,
                              smooth_order_1_weight=args.smooth1_weight,
                              photo_loss_type=args.photo_loss_type,
                              photo_loss_use_occ=args.photo_use_occ),
    )
    if args.lr is not None:  # only override the recipe's own lr when asked
        kw["lr"] = args.lr
    if args.sgu:
        import dataclasses as _dc

        from opticalflowscivis_tpu.models import UPFlowConfig as _UPC

        base = UPFlowTrainConfig().model  # training default (norm on)
        kw["model"] = _dc.replace(base, if_sgu_upsample=True)
        assert isinstance(kw["model"], _UPC)
    cfg = (UPFlowTrainConfig.preset_ex_runner(**kw)
           if args.recipe == "ex_runner" else UPFlowTrainConfig(**kw))
    tr = UPFlowTrainer(cfg)
    if args.dataset == "kitti":
        # ⇔ simple_train.py on KITTI multiview (kitti_data_with_start_point):
        # offset-returning crops feed boundary-dilated photometric warping
        if not args.kitti_image_dir:
            raise SystemExit("--dataset kitti requires --kitti_image_dir")
        if args.hbm_cache > 0:
            from opticalflowscivis_tpu.data.kitti import KittiHBMCache

            cache = KittiHBMCache(args.kitti_image_dir, max_pairs=args.hbm_cache)
            spe = args.steps_per_epoch or max(len(cache) // args.batch_size, 1)
            print(f"kitti: {len(cache)} HBM-cached pairs "
                  f"({cache.frames.nbytes/2**30:.2f} GiB bf16/2), "
                  f"{spe} steps/epoch", flush=True)
            hist = tr.fit_kitti_hbm(cache, spe, epochs=args.epochs,
                                    resume=args.resume)
        else:
            from opticalflowscivis_tpu.data.kitti import KittiPairDataset
            from opticalflowscivis_tpu.data.pipeline import PrefetchSampler

            ds = KittiPairDataset(args.kitti_image_dir)
            spe = args.steps_per_epoch or max(len(ds) // args.batch_size, 1)
            print(f"kitti: {len(ds)} multiview pairs, {spe} steps/epoch",
                  flush=True)
            sampler = PrefetchSampler(
                batch_size=args.batch_size or 8,
                workers=args.prefetch_workers,
                make_dataset=lambda w: KittiPairDataset(
                    args.kitti_image_dir, seed=w),
            ) if args.prefetch_workers > 0 else ds
            try:
                hist = tr.fit_kitti(sampler, spe, epochs=args.epochs,
                                    resume=args.resume)
            finally:
                if sampler is not ds:
                    sampler.close()
    else:
        from opticalflowscivis_tpu.data import get_spec
        from opticalflowscivis_tpu.data.registry import load_raw_series

        frames = load_raw_series(args.dataset, args.data_dir, "train")[..., :1]
        pairs = frames_to_pairs(frames, in_channels=3)
        # per-epoch val EPE vs GT flow when the dataset ships it (loss.json
        # gains val_epe / val_epe_zero_flow — the skill-vs-trivial trajectory)
        spec = get_spec(args.dataset)
        val_pairs = val_flow = None
        series_val = load_raw_series(args.dataset, args.data_dir, "val")
        if (spec.has_flow and series_val.shape[-1] == 1 + spec.ndim
                and series_val.shape[0] >= 2):
            # 64 val pairs (was 33, VERDICT r2 'weak'): validation is now
            # device-resident in fit() — one upload, scalar-only per epoch
            k = min(65, series_val.shape[0])
            val_pairs = frames_to_pairs(series_val[:k, ..., :1], in_channels=3)
            val_flow = (series_val[: k - 1, ..., 1 : 1 + spec.ndim]
                        * spec.gt_flow_stride)
        if args.device_gen:
            import jax.numpy as jnp

            from opticalflowscivis_tpu.data.device_synthetic import (
                multibox_pan_pair_positions,
                multibox_pan_pairs_device,
                multibox_pan_scene_host,
                pan_pair_positions,
                pan_pairs_device,
                pan_scene_host,
            )

            gen_kw = dict(getattr(spec.generator, "keywords", None) or {})
            if gen_kw.get("background") != "pan":
                raise SystemExit("--device_gen requires a pan dataset "
                                 "(rectangle2d_tex_pan / _pan8 / "
                                 "rectangles2d_tex_pan8)")
            pan_v = int(gen_kw.get("pan_vel_max", 3))
            grid, box = (128, 128), (60, 80)
            multibox = spec.name.startswith("rectangles")
            boxes = ((40, 50), (30, 25), (20, 35))  # rectangles_2d defaults
            n_pairs = args.device_gen
            batch = args.batch_size or 8
            spe = max(n_pairs // batch, 1)

            if multibox:
                def pos_sampler(epoch):
                    rng = np.random.default_rng(50_000 + epoch)
                    texs, big, bts, ct = multibox_pan_scene_host(
                        rng, spe * batch + 1, grid, boxes, pan_vel_max=pan_v
                    )
                    bp, cp = multibox_pan_pair_positions(
                        bts, ct, rng.permutation(spe * batch)
                    )
                    return (
                        {"texs": [jnp.asarray(t) for t in texs],
                         "big": jnp.asarray(big)},
                        {"box": jnp.asarray(bp), "cam": jnp.asarray(cp)},
                    )

                def gen_fn(const, pos):
                    return multibox_pan_pairs_device(
                        const["texs"], const["big"], pos["box"], pos["cam"],
                        grid, in_channels=3,
                    )
            else:
                def pos_sampler(epoch):
                    rng = np.random.default_rng(50_000 + epoch)
                    tex, big, bt, ct = pan_scene_host(
                        rng, spe * batch + 1, grid, box, pan_vel_max=pan_v
                    )
                    # permuted pair order: velocities persist up to max_seq
                    # frames, so trajectory-ordered batches share one pan
                    # velocity — shuffling restores per-batch motion
                    # diversity (ADVICE r3)
                    bp, cp = pan_pair_positions(
                        bt, ct, rng.permutation(spe * batch)
                    )
                    return ({"tex": jnp.asarray(tex), "big": jnp.asarray(big)},
                            {"box": bp, "cam": cp})

                def gen_fn(const, pos):
                    return pan_pairs_device(
                        const["tex"], const["big"], pos["box"], pos["cam"],
                        grid, in_channels=3,
                    )

            print(f"device-gen: {spe * batch} fresh pan pairs/epoch "
                  f"(pan_vel_max={pan_v}); val = registry split", flush=True)
            hist = tr.fit_device_gen(
                gen_fn, pos_sampler, spe, epochs=args.epochs,
                resume=args.resume, val_pairs=val_pairs, val_flow=val_flow,
            )
        else:
            hist = tr.fit(pairs, epochs=args.epochs, resume=args.resume,
                          val_pairs=val_pairs, val_flow=val_flow)
    print(json.dumps({"final": hist[-1] if hist else None}), flush=True)


def cmd_test_upflow(argv):
    """⇔ UPFlow/test.py: kitti_2015_test (EPE/F1) and scivis_test (quiver viz)."""
    p = argparse.ArgumentParser(prog="test_upflow")
    _add_common(p)
    p.add_argument("--kitti_root", default=None,
                   help="KITTI-2015 root (runs the Evaluation_bench protocol)")
    p.add_argument("--max_frames", type=int, default=16)
    args = p.parse_args(argv)
    _maybe_cpu(args)

    import jax
    import jax.numpy as jnp

    from opticalflowscivis_tpu.training.upflow_trainer import (
        UPFlowTrainConfig,
        UPFlowTrainer,
        frames_to_pairs,
    )

    cfg = UPFlowTrainConfig(
        exp_dir=os.path.join(args.results_dir, args.dataset, "upflow")
    )
    tr = UPFlowTrainer(cfg)
    report = {}

    if args.kitti_root:
        from opticalflowscivis_tpu.data.kitti import load_kitti_eval_pairs
        from opticalflowscivis_tpu.evalsuite import evaluate_flow
        from opticalflowscivis_tpu.data import pad_to_multiple

        results = []
        for sid, im1, im2, f_occ, m_occ, f_noc, m_noc in load_kitti_eval_pairs(
            args.kitti_root
        ):
            pair = np.stack([im1, im2])[None]
            if tr.state is None:
                tr.init_state(pad_to_multiple(pair, 64, leading_axes=2)[0][:1])
                tr.load_checkpoint()
            _, extras = tr.predict(pair)
            flow = np.asarray(extras["flow_f"][0])[: im1.shape[0], : im1.shape[1]]
            results.append(evaluate_flow(flow[None], f_occ[None], m_occ[None],
                                         f_noc[None], m_noc[None]))
        report["kitti2015"] = {
            k: float(np.mean([r[k] for r in results])) for k in results[0]
        }
    else:
        from opticalflowscivis_tpu.data import get_spec
        from opticalflowscivis_tpu.data.registry import load_raw_series
        from opticalflowscivis_tpu.viz import visualize_series_flow

        spec = get_spec(args.dataset)
        series = load_raw_series(args.dataset, args.data_dir, "test")
        series = series[: args.max_frames]
        frames = series[..., :1]
        pairs = frames_to_pairs(frames, in_channels=3)
        if tr.state is None:
            from opticalflowscivis_tpu.data import pad_to_multiple

            tr.init_state(pad_to_multiple(pairs, 64, leading_axes=2)[0][:1])
            tr.load_checkpoint()
        _, extras = tr.predict(pairs)
        flow = np.asarray(extras["flow_f"])[:, : frames.shape[1], : frames.shape[2]]
        dir_res = os.path.join(args.results_dir, args.dataset, "upflow")
        visualize_series_flow(frames[:-1, ..., 0], flow, dir_res,
                              title="upflow_quiver")
        report["scivis"] = {
            "mean_flow_mag": float(np.mean(np.linalg.norm(flow, axis=-1))),
            "frames": int(frames.shape[0]),
        }
        if spec.has_flow and series.shape[-1] == 1 + spec.ndim:
            # EPE vs the dataset's GT frame-to-frame displacement: stored flow
            # units are converted via spec.gt_flow_stride (e.g. lbs2d stores
            # per-sim-step velocity but keeps every 10th frame)
            gt = series[:-1, ..., 1 : 1 + spec.ndim] * spec.gt_flow_stride
            err = np.linalg.norm(flow - gt, axis=-1)
            report["scivis"]["epe"] = float(err.mean())
            report["scivis"]["epe_zero_flow_baseline"] = float(
                np.linalg.norm(gt, axis=-1).mean()
            )
    print(json.dumps(report), flush=True)


def cmd_select(argv):
    """Time-step selection (README.md:3 third task; error.py:133-157,499-505):
    reconstruct the test series by interpolation and report which time steps
    the interpolator cannot reproduce (keep-worthy) plus the error-vs-|S| curve."""
    p = argparse.ArgumentParser(prog="select")
    _add_common(p)
    p.add_argument("--factor", type=int, default=4)
    p.add_argument("--factors", default="2,4,8,16,32",
                   help="comma list for the selection curve")
    p.add_argument("--linear", action="store_true",
                   help="use the linear-interpolation baseline, no model needed")
    p.add_argument("--threshold", type=float, default=None)
    args = p.parse_args(argv)
    _maybe_cpu(args)

    from opticalflowscivis_tpu.data import load_raw_series
    from opticalflowscivis_tpu.evalsuite import (
        linear_interpolation_baseline,
        select_timesteps,
        selection_curve,
    )

    frames = load_raw_series(args.dataset, args.data_dir, "test")[..., :1]

    if args.linear:
        def reconstruct(fr, factor):
            return linear_interpolation_baseline(fr, factor)
    else:
        from opticalflowscivis_tpu.data import load_data, pad_to_multiple
        from opticalflowscivis_tpu.inference import Interpolator, interpolate_series
        from opticalflowscivis_tpu.training import Trainer

        cfg = _build_cfg(args)
        tr = Trainer(cfg)
        test = load_data(args.dataset, args.exp, "test", args.data_dir)
        padded, _ = pad_to_multiple(test[:2], cfg.pad_multiple, leading_axes=2)
        tr.init_state(padded, total_steps=1)
        if not tr.load_checkpoint():
            raise SystemExit(
                "select needs a trained checkpoint (run `train` first, or "
                "use --linear for the model-free baseline)"
            )
        interp = Interpolator(tr.model, tr.state.params, cfg.pad_multiple)
        cache: dict[int, np.ndarray] = {}

        def reconstruct(fr, factor):
            # selection_curve revisits args.factor — cache just that one
            # (retaining every factor's series would hold N full copies)
            if factor in cache:
                return cache[factor]
            recon, _ = interpolate_series(interp, fr, factor)
            if factor == args.factor:
                cache[factor] = recon
            return recon

    # Everything runs in the model's [0,1] domain (data_range=1); PSNR values
    # are identical to 255-scaling both sides.
    recon = reconstruct(frames, args.factor)
    n = min(frames.shape[0], recon.shape[0])
    selected, thr = select_timesteps(
        frames[:n], recon[:n], args.factor, args.threshold, data_range=1.0
    )
    factors = tuple(int(f) for f in args.factors.split(","))
    curve = selection_curve(frames, reconstruct, factors, data_range=1.0)
    report = {
        "dataset": args.dataset,
        "factor": args.factor,
        "psnr_threshold": round(thr, 3),
        "selected_timesteps": selected,
        "n_selected": len(selected),
        "curve": {str(k): v for k, v in curve.items()},
    }
    os.makedirs(args.results_dir, exist_ok=True)
    out = os.path.join(args.results_dir, f"selection_{args.dataset}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report), flush=True)


def cmd_generate(argv):
    from opticalflowscivis_tpu.data.registry import REGISTRY

    generable = sorted(n for n, s in REGISTRY.items() if s.generator is not None)
    p = argparse.ArgumentParser(prog="generate")
    p.add_argument("--dataset", default="rectangle2d", choices=generable)
    p.add_argument("--data_dir", default="data_cache")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--frames", type=int, default=0, help="0 = reference default")
    args = p.parse_args(argv)

    import functools
    import pickle

    from opticalflowscivis_tpu.data import synthetic

    # seed/frames-parameterizable synthetic generators; LBS-based registry
    # generators (lbs2d/vortex2d/vortex2d_fast) run with their registry
    # defaults (the seed only perturbs the initial condition noise there)
    gens = {
        "rectangle2d": synthetic.rectangle_2d,
        "rectangle2d_tex": functools.partial(synthetic.rectangle_2d,
                                             background="texture"),
        "rectangle2d_tex_pan": functools.partial(synthetic.rectangle_2d,
                                                 background="pan"),
        "rectangles2d": synthetic.rectangles_2d,
        "rectangle3d": synthetic.rectangle_3d,
        "jets3d": synthetic.jets_3d,
    }
    os.makedirs(args.data_dir, exist_ok=True)
    if args.dataset not in gens:
        arr = REGISTRY[args.dataset].generator()
    else:
        kw = {"seed": args.seed}
        if args.frames:
            kw["n_frames"] = args.frames
        arr = gens[args.dataset](**kw)
    path = os.path.join(args.data_dir, f"{args.dataset}.pkl")
    with open(path, "wb") as f:
        pickle.dump(arr, f, protocol=4)
    print(f"wrote {arr.shape} -> {path}", flush=True)


def cmd_bench(argv):
    sys.argv = ["bench"]
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


VERBS = {
    "train": cmd_train,
    "test": cmd_test,
    "inference_img": cmd_inference_img,
    "inference_video": cmd_inference_video,
    "train_upflow": cmd_train_upflow,
    "test_upflow": cmd_test_upflow,
    "select": cmd_select,
    "generate": cmd_generate,
    "bench": cmd_bench,
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in VERBS:
        print(f"usage: python -m opticalflowscivis_tpu.cli <{'|'.join(VERBS)}> [flags]")
        raise SystemExit(2)
    VERBS[sys.argv[1]](sys.argv[2:])


if __name__ == "__main__":
    main()
