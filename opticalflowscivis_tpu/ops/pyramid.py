"""Gaussian / Laplacian pyramid and Laplacian-pyramid L1 loss — rank-generic.

Parity notes (reference: Flow-2D/model/laplacian.py):
- ``gauss_kernel`` is the 5-tap binomial [1,4,6,4,1]/16 outer-producted to 2-D
  (laplacian.py:10-19); we keep it separable so the same code does 1-/2-/3-D.
- ``downsample`` is plain ::2 striding (laplacian.py:21-22).
- ``upsample`` zero-interleaves then convolves with the 4x kernel
  (laplacian.py:24-35) — 2x per axis, so the 3-D factor is 8x.
- ``LapLoss`` sums mean-L1 over 5 pyramid levels of the diff stacks
  (laplacian.py:75-88).
- The reference's 3-D LapLoss is broken (scipy on detached numpy,
  Flow-3D/model/laplacian.py:48-57) so 3-D training fell back to plain L1
  (Flow-3D/model/RIFE.py:132-134).  This implementation works for 3-D; configs
  can still select plain L1 for reference-faithful 3-D behaviour.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BINOMIAL5 = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


def _blur_axis(x: jax.Array, axis: int, gain: float = 1.0) -> jax.Array:
    """5-tap binomial filter along one axis with reflect padding (torch 'reflect')."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (2, 2)
    xp = jnp.pad(x, pad, mode="reflect")
    length = x.shape[axis]
    out = None
    for k, w in enumerate(_BINOMIAL5):
        sl = jax.lax.slice_in_dim(xp, k, k + length, axis=axis)
        term = sl * (w * gain)
        out = term if out is None else out + term
    return out


def gaussian_blur(x: jax.Array, gain_per_axis: float = 1.0) -> jax.Array:
    """Separable binomial blur over all spatial axes of ``[B, *S, C]``."""
    for axis in range(1, x.ndim - 1):
        x = _blur_axis(x, axis, gain=gain_per_axis)
    return x


def _downsample(x: jax.Array) -> jax.Array:
    idx = tuple([slice(None)] + [slice(None, None, 2)] * (x.ndim - 2) + [slice(None)])
    return x[idx]


def _upsample(x: jax.Array) -> jax.Array:
    """Zero-interleave 2x per spatial axis then blur with the 2x-per-axis kernel."""
    cfg = [(0, 0, 0)] + [(0, 1, 1)] * (x.ndim - 2) + [(0, 0, 0)]
    x = jax.lax.pad(x, jnp.zeros((), x.dtype), cfg)
    return gaussian_blur(x, gain_per_axis=2.0)


def laplacian_pyramid(img: jax.Array, max_levels: int = 5) -> list[jax.Array]:
    """Difference pyramid: level i = current - upsample(downsample(blur(current)))."""
    current = img
    pyr = []
    for _ in range(max_levels):
        filtered = gaussian_blur(current)
        down = _downsample(filtered)
        up = _upsample(down)
        # For odd sizes `up` overshoots by one; crop statically (reference crops
        # both, laplacian.py:63-67 — sizes here are static under jit).
        crop = tuple(
            [slice(None)]
            + [slice(0, s) for s in current.shape[1:-1]]
            + [slice(None)]
        )
        pyr.append(current - up[crop])
        current = down
    return pyr


@partial(jax.jit, static_argnames=("max_levels",))
def lap_loss(pred: jax.Array, target: jax.Array, max_levels: int = 5) -> jax.Array:
    """Sum over levels of mean-|diff| between the two Laplacian pyramids."""
    pyr_p = laplacian_pyramid(pred, max_levels)
    pyr_t = laplacian_pyramid(target, max_levels)
    return sum(jnp.mean(jnp.abs(a - b)) for a, b in zip(pyr_p, pyr_t))
