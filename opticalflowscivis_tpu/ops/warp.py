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
- ``UPFlow/utils/tools.py:393-541`` (boundary_dilated_warp): photometric warping
  of the *uncropped* image using the crop offset ``start`` so that flow targets
  outside the crop still sample real pixels — ``boundary_dilated_warp`` here.

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


def multilinear_sample(
    img: jax.Array,
    coords: jax.Array,
    padding: str = "border",
    return_mask: bool = False,
):
    """Sample ``img [B, *S_src, C]`` at absolute pixel ``coords [B, *S_out, ndim]``.

    2^ndim corner gathers with multilinear weights; 'border' clamps, 'zeros'
    drops out-of-range corner contributions.  The optional mask is the fraction
    of interpolation weight that fell inside the image.
    """
    if padding not in ("border", "zeros"):
        raise ValueError(f"padding must be 'border' or 'zeros', got {padding!r}")
    src_spatial = _spatial_shape(img)
    ndim = len(src_spatial)
    if coords.shape[-1] != ndim:
        raise ValueError(f"coords have {coords.shape[-1]} dims for {ndim}-D input")
    out_spatial = tuple(coords.shape[1:-1])

    compute_dtype = jnp.promote_types(img.dtype, jnp.float32)
    coords = coords.astype(compute_dtype)

    lo = jnp.floor(coords)
    frac = coords - lo
    lo_i = lo.astype(jnp.int32)

    strides = []
    acc = 1
    for size in reversed(src_spatial):
        strides.append(acc)
        acc *= size
    strides = strides[::-1]
    n_vox = acc

    b = img.shape[0]
    c = img.shape[-1]
    img_flat = img.reshape(b, n_vox, c).astype(compute_dtype)
    n_out = 1
    for s in out_spatial:
        n_out *= s

    out = jnp.zeros((b,) + out_spatial + (c,), compute_dtype)
    mask_out = jnp.zeros((b,) + out_spatial, compute_dtype)

    # 2^ndim corner gathers.  XLA fuses the weight math; the gather itself is
    # the memory-bound part (Pallas sampler is the planned fast path for 3-D).
    for corner in itertools.product((0, 1), repeat=ndim):
        weight = jnp.ones((b,) + out_spatial, compute_dtype)
        flat_idx = jnp.zeros((b,) + out_spatial, jnp.int32)
        valid = jnp.ones((b,) + out_spatial, bool)
        for i, hi_side in enumerate(corner):
            idx = lo_i[..., i] + hi_side
            w = frac[..., i] if hi_side else (1.0 - frac[..., i])
            valid &= (idx >= 0) & (idx <= src_spatial[i] - 1)
            idx = jnp.clip(idx, 0, src_spatial[i] - 1)
            weight = weight * w
            flat_idx = flat_idx + idx * strides[i]
        if padding == "zeros":
            weight = jnp.where(valid, weight, 0.0)
        gathered = jnp.take_along_axis(
            img_flat, flat_idx.reshape(b, n_out, 1), axis=1
        ).reshape((b,) + out_spatial + (c,))
        out = out + gathered * weight[..., None]
        mask_out = mask_out + jnp.where(valid, weight, 0.0)

    out = out.astype(img.dtype)
    if return_mask:
        return out, mask_out[..., None].astype(img.dtype)
    return out


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
        mask.

    Returns:
      Warped image ``[B, *spatial, C]`` (and optionally the validity mask).
    """
    spatial = _spatial_shape(img)
    ndim = len(spatial)
    if flow.shape[-1] != ndim:
        raise ValueError(f"flow has {flow.shape[-1]} channels for {ndim}-D input")
    compute_dtype = jnp.promote_types(img.dtype, jnp.float32)
    base = jnp.stack(
        [jax.lax.broadcasted_iota(compute_dtype, spatial, i) for i in range(ndim)],
        axis=-1,
    )
    coords = base[None] + flow.astype(compute_dtype)
    return multilinear_sample(img, coords, padding, return_mask)


def _slab_warp_core(
    img_zpad: jax.Array,
    flow: jax.Array,
    r_z: int,
    padding: str,
    r_yx: int,
    remat_taps: bool,
    z0=0,
    z_total: int | None = None,
    vary_axes: tuple[str, ...] = (),
) -> jax.Array:
    """Shared slab-decomposition scan over z taps.

    ``img_zpad`` is the (local) volume already padded with ``mz = r_z + 1``
    slices on each z side (edge-repeat of the *global* volume boundary, real
    neighbor slices for sharded callers); ``flow`` is the unpadded (local)
    flow field.  ``z0`` is the global z index of local slice 0 and ``z_total``
    the global depth — both only matter for the 'zeros' validity weights; they
    may be traced values (``z0`` is a ``lax.axis_index`` under shard_map).
    ``vary_axes`` names the shard_map mesh axes the inputs vary over — the
    scan's zero initial carries must carry the same varying-manual-axes type
    or lax.scan rejects the carry (replicated-in, varying-out).
    """
    b, z, y, x, c = flow.shape[:4] + img_zpad.shape[-1:]
    mz = r_z + 1
    if z_total is None:
        z_total = z
    fz = jnp.clip(flow[..., 0].astype(jnp.float32), -r_z, r_z)
    flow_yx = flow[..., 1:3].reshape(b * z, y, x, 2)

    # in-plane warp backend: r_yx > 0 selects the MXU one-hot kernel on TPU
    # (exact for |flow_{y,x}| <= r_yx) — the jnp gather path costs ~250x more
    # device time per slab on v5e
    if r_yx > 0 and jax.default_backend() == "tpu":
        from opticalflowscivis_tpu.ops.pallas.warp import (
            backward_warp_pallas,
            warp2d_pallas_supported,
        )

        if warp2d_pallas_supported((b * z, y, x, c), r_yx):
            def warp2d(im, fl):
                return backward_warp_pallas(im, fl, r_yx, padding)
        else:
            def warp2d(im, fl):
                return backward_warp(im, fl, padding=padding)
    else:
        def warp2d(im, fl):
            return backward_warp(im, fl, padding=padding)

    # lax.scan over the (2*r_z+3) z taps: one traced 2-D warp instance instead
    # of an unrolled tap loop (the unrolled version at 256^3 produced a program
    # XLA took tens of minutes to compile).
    def tap(carry, s):
        out, vz_sum = carry
        s_f = s.astype(jnp.float32) - mz
        wz = jnp.maximum(0.0, 1.0 - jnp.abs(fz - s_f))
        shifted = jax.lax.dynamic_slice_in_dim(img_zpad, s, z, axis=1)
        warped = warp2d(shifted.reshape(b * z, y, x, c), flow_yx).reshape(
            b, z, y, x, c
        )
        out = out + wz[..., None] * warped.astype(jnp.float32)
        if vz_sum is not None:
            zsrc = (
                jnp.arange(z, dtype=jnp.float32).reshape(1, z, 1, 1) + z0 + s_f
            )
            vz_sum = vz_sum + wz * ((zsrc >= 0) & (zsrc <= z_total - 1))
        return (out, vz_sum), None

    out0 = jnp.zeros((b, z, y, x, c), jnp.float32)
    vz0 = jnp.zeros((b, z, y, x), jnp.float32) if padding == "zeros" else None
    if vary_axes:
        out0 = jax.lax.pcast(out0, vary_axes, to="varying")
        if vz0 is not None:
            vz0 = jax.lax.pcast(vz0, vary_axes, to="varying")
    if remat_taps:
        # Training at 256^3: the scan's backward otherwise stacks per-tap
        # residuals — (2*r_z+3) full-resolution warped volumes per warp call
        # (~4 GB each at 256^3 x f32, the dominant term of a 44 GB OOM).
        # Rematerializing the tap recomputes the cheap MXU 2-D warps in the
        # backward pass instead; only the shared inputs stay resident.
        tap = jax.checkpoint(tap)
    (out, vz_sum), _ = jax.lax.scan(
        tap, (out0, vz0), jnp.arange(2 * mz + 1, dtype=jnp.int32)
    )
    if vz_sum is not None:
        # out-of-range z taps clamp to the edge slab whose in-bounds twin has
        # the same value, so scaling by the in-bounds weight fraction converts
        # border accumulation to exact zeros semantics.
        out = out * jnp.clip(vz_sum, 0.0, 1.0)[..., None]
    return out.astype(img_zpad.dtype)


@partial(jax.jit, static_argnames=("r_z", "padding", "r_yx", "remat_taps"))
def backward_warp3d_slab(
    img: jax.Array,
    flow: jax.Array,
    r_z: int = 8,
    padding: str = "border",
    r_yx: int = 0,
    remat_taps: bool = False,
) -> jax.Array:
    """Trilinear warp of large volumes without HBM-random gathers.

    Measured on v5e: a plain gather warp costs ~1.2 s at 256^3 (the volume
    exceeds VMEM so XLA's gather goes through HBM-random access), while 2-D
    gathers on VMEM-resident slices are ~30 000x cheaper per element.  This
    decomposes the trilinear sample exactly:

      out[z] = Σ_s hat(flow_z - s) · bilinear2d(img[z+s], flow_yx)   s ∈ [-r_z-1, r_z+1]

    i.e. (2·r_z+3) z-shifted copies, each warped in-plane with z folded into
    the 2-D warp's batch.  Exact for |flow_z| <= r_z (clamped beyond; SciVis
    velocities are <= 8 px/step, Datasets/create_data_3d.py:56-57); in-plane
    displacement is unrestricted.  Pure jnp — differentiable and portable.

    img: [B, Z, Y, X, C]; flow: [B, Z, Y, X, 3] row-major (dz, dy, dx).
    """
    mz = r_z + 1
    img_zpad = jnp.pad(img, [(0, 0), (mz, mz), (0, 0), (0, 0), (0, 0)], mode="edge")
    return _slab_warp_core(img_zpad, flow, r_z, padding, r_yx, remat_taps)


@jax.jit
def boundary_dilated_warp(
    img_raw: jax.Array, flow: jax.Array, start: jax.Array
) -> jax.Array:
    """Warp the *uncropped* image for a crop-sized flow field.

    ⇔ ``tools.boundary_dilated_warp.warp_im`` (UPFlow/utils/tools.py:393-541):
    the training crop sits at offset ``start [B, ndim]`` inside ``img_raw``;
    sampling at (crop grid + start + flow) lets flow vectors that point outside
    the crop (but inside the raw image) hit real pixels instead of padding.

    Returns a crop-shaped warped image ``[B, *S_crop, C]``.
    """
    ndim = flow.shape[-1]
    crop_spatial = tuple(flow.shape[1:-1])
    compute_dtype = jnp.promote_types(img_raw.dtype, jnp.float32)
    base = jnp.stack(
        [jax.lax.broadcasted_iota(compute_dtype, crop_spatial, i) for i in range(ndim)],
        axis=-1,
    )
    offset = start.astype(compute_dtype).reshape(
        (start.shape[0],) + (1,) * ndim + (ndim,)
    )
    coords = base[None] + offset + flow.astype(compute_dtype)
    return multilinear_sample(img_raw, coords, padding="border")
