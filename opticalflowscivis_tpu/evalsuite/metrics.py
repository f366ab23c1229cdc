"""Interpolation quality metrics — parity with the reference ``error.py``.

- ``calculate_psnr``  ⇔ error.py:27-34 (255-range, float64 MSE).
- ``calculate_ssim``  ⇔ error.py:36-76 (MATLAB 11x11 gaussian sigma=1.5, valid
  convolution, 255-range) — thin numpy wrapper over ``ops.ssim_matlab``.
- ``calculate_metrics`` ⇔ error.py:78-157: per-frame PSNR/SSIM split into kept
  (i % factor == 0) vs interpolated frames; returns the interpolated-frame means
  (the headline numbers, reference results at error.py:442-443).
- ``calculate_diff``  ⇔ error.py:202-263: |original - interpolated| stack,
  globally contrast-stretched to [0, 1].
- ``linear_interpolation_baseline`` ⇔ error.py:345-505: reconstruct the series
  by linear interpolation between kept frames — the baseline every model result
  is compared against.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from opticalflowscivis_tpu.ops import ssim_matlab


def calculate_psnr(img1: np.ndarray, img2: np.ndarray, data_range: float = 255.0) -> float:
    img1 = np.asarray(img1, np.float64)
    img2 = np.asarray(img2, np.float64)
    mse = float(np.mean((img1 - img2) ** 2))
    if mse == 0:
        return float("inf")
    return 20 * math.log10(data_range / math.sqrt(mse))


def calculate_ssim(img1: np.ndarray, img2: np.ndarray) -> float:
    """MATLAB-protocol SSIM on 255-range images.

    Accepts [H, W], [H, W, C] (C <= 4 treated as channels), [B, *S] or
    [B, *S, C] — normalized to the channels-last batched layout.
    """
    a = jnp.asarray(img1, jnp.float32)
    b = jnp.asarray(img2, jnp.float32)
    if a.ndim == 2:  # [H, W]
        a, b = a[None, ..., None], b[None, ..., None]
    elif a.ndim == 3 and a.shape[-1] <= 4:  # [H, W, C]
        a, b = a[None], b[None]
    elif a.ndim == 3:  # [B/T, H, W]
        a, b = a[..., None], b[..., None]
    return float(ssim_matlab(a, b))


def calculate_metrics(
    original: np.ndarray, interpol: np.ndarray, factor: int, data_range: float = 255.0
) -> tuple[float, float]:
    """Mean PSNR/SSIM over the *interpolated* frames (i % factor != 0)."""
    n = min(original.shape[0], interpol.shape[0])
    psnrs, ssims = [], []
    for i in range(n):
        if i % factor != 0:
            psnrs.append(calculate_psnr(original[i], interpol[i], data_range))
            scale = 255.0 / data_range
            ssims.append(calculate_ssim(original[i] * scale, interpol[i] * scale))
    return float(np.mean(psnrs)), float(np.mean(ssims))


def calculate_diff(original: np.ndarray, interpol: np.ndarray) -> np.ndarray:
    n = min(original.shape[0], interpol.shape[0])
    diffs = np.abs(
        np.asarray(original[:n], np.float32) - np.asarray(interpol[:n], np.float32)
    )
    lo, hi = diffs.min(), diffs.max()
    if hi > lo:
        diffs = (diffs - lo) / (hi - lo)
    return diffs


def linear_interpolation_baseline(data: np.ndarray, factor: int) -> np.ndarray:
    """Reconstruct ``data`` keeping every ``factor``-th frame and linearly
    interpolating the rest (the reference's comparison baseline)."""
    n = data.shape[0]
    out = np.array(data, np.float32, copy=True)
    kept = np.arange(0, n, factor)
    for a, b in zip(kept[:-1], kept[1:]):
        for i in range(a + 1, b):
            t = (i - a) / (b - a)
            out[i] = (1 - t) * data[a] + t * data[b]
    # trailing frames past the last kept frame are held constant
    last = kept[-1]
    out[last + 1 :] = data[last]
    return out
