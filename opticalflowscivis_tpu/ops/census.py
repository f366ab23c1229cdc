"""Census (ternary) transform and census loss — rank-generic.

Parity notes:
- RIFE's ``Ternary`` (Flow-2D/model/loss.py:20-55): 7x7 patches gathered with an
  identity conv, soft-ternary normalization ``t/sqrt(0.81+t^2)``, hamming distance
  ``mean(d^2/(0.1+d^2))``, multiplied by a 1-pixel-border validity mask.
- UPFlow's ``census_loss_torch`` (UPFlow/utils/loss.py:51-91): same transform
  (patch 7), distance per pixel, charbonnier-style robust penalty
  ``(|d|+0.01)^0.4`` averaged inside an occlusion mask eroded by a border mask.

Patch gathering is shift-and-stack (no conv needed — identity-kernel convs in the
reference exist only because torch lacks an unfold that autodiffs cheaply).
"""

from __future__ import annotations

import itertools
from functools import partial

import jax
import jax.numpy as jnp


def _extract_patches(img: jax.Array, radius: int) -> jax.Array:
    """``[B, *S, 1] -> [B, *S, (2r+1)^ndim]`` zero-padded neighborhood values."""
    spatial = img.shape[1:-1]
    ndim = len(spatial)
    pad = [(0, 0)] + [(radius, radius)] * ndim + [(0, 0)]
    ip = jnp.pad(img, pad)
    outs = []
    for off in itertools.product(range(2 * radius + 1), repeat=ndim):
        sl = tuple(
            [slice(None)]
            + [slice(o, o + s) for o, s in zip(off, spatial)]
            + [0]
        )
        outs.append(ip[sl])
    return jnp.stack(outs, axis=-1)


@partial(jax.jit, static_argnames=("patch_size",))
def census_transform(img: jax.Array, patch_size: int = 7) -> jax.Array:
    """Soft ternary transform of a single-channel image ``[B, *S, 1]``."""
    if img.shape[-1] != 1:
        # Luminance collapse for multi-channel input (loss.py:36-39 uses rgb2gray).
        img = jnp.mean(img, axis=-1, keepdims=True)
    radius = patch_size // 2
    patches = _extract_patches(img, radius)
    t = patches - img
    return t / jnp.sqrt(0.81 + t * t)


def _hamming(t1: jax.Array, t2: jax.Array) -> jax.Array:
    d = (t1 - t2) ** 2
    return jnp.mean(d / (0.1 + d), axis=-1, keepdims=True)


def _border_mask(shape_spatial: tuple[int, ...], pad: int, dtype) -> jax.Array:
    inner = jnp.ones([s - 2 * pad for s in shape_spatial], dtype)
    return jnp.pad(inner, [(pad, pad)] * len(shape_spatial))[None, ..., None]


@partial(jax.jit, static_argnames=("patch_size", "robust"))
def census_loss(
    img0: jax.Array,
    img1: jax.Array,
    mask: jax.Array | None = None,
    patch_size: int = 7,
    robust: bool = False,
) -> jax.Array:
    """Census distance between two images.

    ``robust=False`` reproduces RIFE's Ternary map semantics (mean over the
    1-pixel-valid region); ``robust=True`` applies UPFlow's ``(|d|+0.01)^0.4``
    penalty normalized by the (optionally occlusion-) masked area.
    """
    t0 = census_transform(img0, patch_size)
    t1 = census_transform(img1, patch_size)
    dist = _hamming(t0, t1)
    valid = _border_mask(img0.shape[1:-1], 1, dist.dtype)
    if robust:
        dist = (jnp.abs(dist) + 0.01) ** 0.4
    m = valid if mask is None else valid * mask
    return jnp.sum(dist * m) / (jnp.sum(m) + 1e-6)
