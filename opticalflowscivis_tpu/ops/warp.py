"""Backward warping (grid-sample) — rank-generic bilinear/trilinear gather.

TPU-native re-design of the reference warp layers:

- ``Flow-2D/model/warplayer.py:7`` builds a normalized [-1, 1] meshgrid, adds the
  pixel flow scaled by ``2/(dim-1)`` and calls ``grid_sample(bilinear,
  padding_mode='border', align_corners=True)``.  With align_corners=True that
  normalization is an exact linear map from pixel coordinates, so we skip the
  round-trip entirely and sample directly in pixel space (also removes the
  reference's per-(device,size) grid cache — grids are traced constants under jit).
- ``Flow-3D/model/warplayer.py`` is the same with a 5-D grid (trilinear).
- ``UPFlow/model/pwc_modules.py:179-207`` (WarpingLayer_no_div) uses
  padding_mode='zeros' plus a warped-ones validity mask; our ``padding='zeros'``
  zeroes out-of-range corner contributions which matches grid_sample zeros
  semantics, and the validity mask is available via ``return_mask=True``.

Flow convention: ``flow[..., i]`` displaces along spatial axis ``i`` (row-major),
i.e. (dy, dx) for 2-D and (dz, dy, dx) for 3-D — unlike the reference's
(x-first) grid_sample channel order.  Layout: channels-last.
"""

from __future__ import annotations

import itertools
from functools import partial

import jax
import jax.numpy as jnp


def _spatial_shape(img: jax.Array) -> tuple[int, ...]:
    return tuple(img.shape[1:-1])


@partial(jax.jit, static_argnames=("padding", "return_mask"))
def backward_warp(
    img: jax.Array,
    flow: jax.Array,
    padding: str = "border",
    return_mask: bool = False,
):
    """Sample ``img`` at (identity + flow) with multilinear interpolation.

    Args:
      img: ``[B, *spatial, C]`` input to sample from.
      flow: ``[B, *spatial, ndim]`` pixel-space displacements; ``flow[..., i]``
        moves along spatial axis ``i``.
      padding: ``'border'`` (clamp, like grid_sample border + align_corners=True)
        or ``'zeros'`` (out-of-range corners contribute 0).
      return_mask: if True also return ``[B, *spatial, 1]`` in-bounds validity
        mask (fraction of interpolation weight that fell inside the image).

    Returns:
      Warped image ``[B, *spatial, C]`` (and optionally the validity mask).
    """
    if padding not in ("border", "zeros"):
        raise ValueError(f"padding must be 'border' or 'zeros', got {padding!r}")
    spatial = _spatial_shape(img)
    ndim = len(spatial)
    if flow.shape[-1] != ndim:
        raise ValueError(f"flow has {flow.shape[-1]} channels for {ndim}-D input")

    compute_dtype = jnp.promote_types(img.dtype, jnp.float32)
    flow = flow.astype(compute_dtype)

    # Absolute sample coordinates per axis: base grid + displacement.
    coords = []
    for i, size in enumerate(spatial):
        base = jax.lax.broadcasted_iota(compute_dtype, spatial, i)
        coords.append(base[None] + flow[..., i])

    lo = [jnp.floor(c) for c in coords]
    frac = [c - f for c, f in zip(coords, lo)]
    lo_i = [f.astype(jnp.int32) for f in lo]

    strides = []
    acc = 1
    for size in reversed(spatial):
        strides.append(acc)
        acc *= size
    strides = strides[::-1]
    n_vox = acc

    b = img.shape[0]
    c = img.shape[-1]
    img_flat = img.reshape(b, n_vox, c).astype(compute_dtype)

    out = jnp.zeros((b,) + spatial + (c,), compute_dtype)
    mask_out = jnp.zeros((b,) + spatial, compute_dtype)

    # 2^ndim corner gathers.  XLA fuses the weight math; the gather itself is the
    # memory-bound part (Pallas sampler is the planned fast path for 3-D).
    for corner in itertools.product((0, 1), repeat=ndim):
        weight = jnp.ones((b,) + spatial, compute_dtype)
        flat_idx = jnp.zeros((b,) + spatial, jnp.int32)
        valid = jnp.ones((b,) + spatial, bool)
        for i, hi_side in enumerate(corner):
            idx = lo_i[i] + hi_side
            w = frac[i] if hi_side else (1.0 - frac[i])
            valid &= (idx >= 0) & (idx <= spatial[i] - 1)
            idx = jnp.clip(idx, 0, spatial[i] - 1)
            weight = weight * w
            flat_idx = flat_idx + idx * strides[i]
        if padding == "zeros":
            weight = jnp.where(valid, weight, 0.0)
        gathered = jnp.take_along_axis(
            img_flat, flat_idx.reshape(b, n_vox, 1), axis=1
        ).reshape((b,) + spatial + (c,))
        out = out + gathered * weight[..., None]
        mask_out = mask_out + jnp.where(valid, weight, 0.0)

    out = out.astype(img.dtype)
    if return_mask:
        return out, mask_out[..., None].astype(img.dtype)
    return out
