"""SSIM — MATLAB-equivalent gaussian-window structural similarity, rank-generic.

Parity notes:
- ``error.py:36-76`` (the headline-metric path) computes per-image SSIM with an
  11x11 gaussian window, sigma=1.5, C1=(0.01*255)^2, C2=(0.03*255)^2, 'valid'
  convolution on 255-range images — that is ``ssim_matlab`` here.
- ``Flow-2D/model/pytorch_msssim`` provides the same statistic with 'same'
  padding on [0,1]-range tensors (used for duplicate/scene-cut gates in
  inference_video.py:244-275) — that is ``ssim(..., data_range=1.0)``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _gauss_taps(win_size: int, sigma: float) -> np.ndarray:
    x = np.arange(win_size) - (win_size - 1) / 2.0
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _filter(x: jax.Array, taps: np.ndarray, valid: bool) -> jax.Array:
    """Separable filtering over spatial axes of ``[B, *S, C]``."""
    win = len(taps)
    r = win // 2
    for axis in range(1, x.ndim - 1):
        if not valid:
            pad = [(0, 0)] * x.ndim
            pad[axis] = (r, r)
            xp = jnp.pad(x, pad)  # zero pad ('same' conv, like F.conv2d padding=r)
        else:
            xp = x
        length = xp.shape[axis] - win + 1
        out = None
        for k in range(win):
            sl = jax.lax.slice_in_dim(xp, k, k + length, axis=axis)
            term = sl * float(taps[k])
            out = term if out is None else out + term
        x = out
    return x


@partial(jax.jit, static_argnames=("data_range", "win_size", "sigma", "valid"))
def ssim(
    img1: jax.Array,
    img2: jax.Array,
    data_range: float = 1.0,
    win_size: int = 11,
    sigma: float = 1.5,
    valid: bool = False,
) -> jax.Array:
    """Mean SSIM between ``[B, *S, C]`` images."""
    taps = _gauss_taps(win_size, sigma)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)

    mu1 = _filter(x, taps, valid)
    mu2 = _filter(y, taps, valid)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter(x * x, taps, valid) - mu1_sq
    sigma2_sq = _filter(y * y, taps, valid) - mu2_sq
    sigma12 = _filter(x * y, taps, valid) - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)


def ssim_matlab(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """MATLAB-protocol SSIM on 255-range images with valid convolution (error.py:36-76)."""
    return ssim(img1, img2, data_range=255.0, valid=True)
