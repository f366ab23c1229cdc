"""Standard VFI benchmark loops — ports of ``Flow-2D/benchmark/*``.

Each function takes an ``inference.Interpolator`` (any model: trained IFNet or
imported HDv3) plus a dataset root and returns the protocol's metrics:

- ``bench_triplet_dirs``  ⇔ UCF101.py / ATD12K-style: directories with
  (frame_00, frame_02, frame_01_gt) pngs → mean PSNR/SSIM, with the reference's
  round-to-uint8 quantization before scoring (UCF101.py:32-35).
- ``bench_vimeo90k``      ⇔ Vimeo90K.py: the tri_testlist triplets.
- ``bench_middlebury``    ⇔ MiddleBury_Other.py: interpolation error (IE — RMS
  of 255-range abs diff) over the 12 Other sequences.
- ``bench_latency``       ⇔ testtime.py:17-29: timed inference calls at
  1x480x640 after warmup (inputs varied per call — the TPU relay caches
  identical-input executions).
"""

from __future__ import annotations

import math
import os
import time

import numpy as np

from opticalflowscivis_tpu.evalsuite.metrics import calculate_psnr, calculate_ssim


def _load_rgb(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(path)
    return img[..., ::-1].astype(np.float32) / 255.0


def _score_pair(pred: np.ndarray, gt: np.ndarray) -> tuple[float, float]:
    pred = np.round(pred * 255.0) / 255.0  # uint8 quantization (UCF101.py:33)
    psnr = -10 * math.log10(max(float(((gt - pred) ** 2).mean()), 1e-12))
    ssim = calculate_ssim(pred * 255.0, gt * 255.0)
    return psnr, ssim


def bench_triplet_dirs(
    interp,
    root: str,
    frame0: str = "frame_00.png",
    frame1: str = "frame_02.png",
    gt_name: str = "frame_01_gt.png",
    limit: int = 0,
) -> dict:
    dirs = sorted(os.listdir(root))
    if limit:
        dirs = dirs[:limit]
    psnrs, ssims = [], []
    for d in dirs:
        img0 = _load_rgb(os.path.join(root, d, frame0))
        img1 = _load_rgb(os.path.join(root, d, frame1))
        gt = _load_rgb(os.path.join(root, d, gt_name))
        pred, _, _ = interp.pair(img0[None], img1[None])
        p, s = _score_pair(pred[0], gt)
        psnrs.append(p)
        ssims.append(s)
    return {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims)),
            "n": len(dirs)}


def bench_vimeo90k(interp, root: str, limit: int = 0) -> dict:
    with open(os.path.join(root, "tri_testlist.txt")) as f:
        triplets = [line.strip() for line in f if line.strip()]
    if limit:
        triplets = triplets[:limit]
    psnrs, ssims = [], []
    for tri in triplets:
        d = os.path.join(root, "sequences", tri)
        img0 = _load_rgb(os.path.join(d, "im1.png"))
        img1 = _load_rgb(os.path.join(d, "im3.png"))
        gt = _load_rgb(os.path.join(d, "im2.png"))
        pred, _, _ = interp.pair(img0[None], img1[None])
        p, s = _score_pair(pred[0], gt)
        psnrs.append(p)
        ssims.append(s)
    return {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims)),
            "n": len(triplets)}


_MIDDLEBURY = ["Beanbags", "Dimetrodon", "DogDance", "Grove2", "Grove3",
               "Hydrangea", "MiniCooper", "RubberWhale", "Urban2", "Urban3",
               "Venus", "Walking"]


def bench_middlebury(interp, data_root: str, gt_root: str) -> dict:
    """Interpolation error (mean abs-diff RMS, 255 range) per sequence."""
    ies = {}
    for name in _MIDDLEBURY:
        img0 = _load_rgb(os.path.join(data_root, name, "frame10.png"))
        img1 = _load_rgb(os.path.join(data_root, name, "frame11.png"))
        gt = _load_rgb(os.path.join(gt_root, name, "frame10i11.png"))
        pred, _, _ = interp.pair(img0[None], img1[None])
        ie = float(np.mean(np.abs(pred[0] - gt) * 255.0))
        ies[name] = round(ie, 3)
    ies["mean"] = round(float(np.mean(list(ies.values()))), 3)
    return ies


def bench_latency(
    interp, shape: tuple[int, int, int] = (480, 640, 3), warmup: int = 10,
    iters: int = 50,
) -> dict:
    """testtime.py protocol on TPU: varied inputs, best-of-3 mean latency."""
    import jax

    rng = np.random.default_rng(0)
    variants = [
        (rng.uniform(0, 1, (1,) + shape).astype(np.float32),
         rng.uniform(0, 1, (1,) + shape).astype(np.float32))
        for _ in range(4)
    ]
    for v in variants[: max(warmup // len(variants), 1)]:
        interp.pair(*v)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            out, _, _ = interp.pair(*variants[i % len(variants)])
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return {"mean_latency_ms": round(best * 1000, 3),
            "pairs_per_sec": round(1.0 / best, 2)}
