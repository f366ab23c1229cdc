"""Spatial resizing with flow-magnitude rescaling — rank-generic.

Parity notes:
- ``F.interpolate(..., mode='bilinear'/'trilinear', align_corners=False)`` as used
  throughout the reference (Flow-2D/model/IFNet.py:89-116, Flow-3D/model/IFNet.py)
  uses half-pixel sampling, which is exactly ``jax.image.resize(method='linear')``.
- Flow fields are displacement fields in pixel units, so any resize must also
  scale the values: IFNet multiplies by ``1/scale`` on the way down and ``scale``
  on the way up (IFNet.py:92,115); UPFlow's ``upsample2d_flow_as(..., if_rate=True)``
  rescales by the size ratio (UPFlow/model/pwc_modules.py:77-90).  Here each flow
  channel is rescaled by its own axis ratio (exact for anisotropic resizes; the
  reference uses a single scalar because its resizes are isotropic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _resize_align_corners(x: jax.Array, spatial: tuple[int, ...]) -> jax.Array:
    """Linear resize with align_corners=True (UPFlow path, pwc_modules.py:77-90).

    Endpoint-aligned sampling: out coord i ↦ in coord i*(src-1)/(dst-1), done via
    ``jax.image.scale_and_translate`` (scale=(dst-1)/(src-1), translation chosen
    so the half-pixel convention cancels).
    """
    src = x.shape[1:-1]
    scales = [(d - 1) / (s - 1) if s > 1 else 1.0 for d, s in zip(spatial, src)]
    trans = [0.5 - 0.5 * sc for sc in scales]
    out_shape = (x.shape[0], *spatial, x.shape[-1])
    return jax.image.scale_and_translate(
        x,
        out_shape,
        spatial_dims=tuple(range(1, x.ndim - 1)),
        scale=jnp.asarray(scales, jnp.float32),
        translation=jnp.asarray(trans, jnp.float32),
        method="linear",
        antialias=False,
    )


def resize_spatial(
    x: jax.Array,
    spatial: tuple[int, ...],
    method: str = "linear",
    align_corners: bool = False,
) -> jax.Array:
    """Resize ``[B, *S, C]`` to ``[B, *spatial, C]``.

    ``align_corners=False`` is half-pixel (torch F.interpolate default, the RIFE
    path); ``align_corners=True`` is endpoint-aligned (the UPFlow path).
    """
    out_shape = (x.shape[0], *spatial, x.shape[-1])
    if out_shape == x.shape:
        return x
    if align_corners:
        return _resize_align_corners(x, spatial)
    # antialias=False: torch F.interpolate never low-pass-filters on downsample,
    # and reference parity (verified vs torch to 3e-8) requires matching that.
    return jax.image.resize(x, out_shape, method=method, antialias=False)


def resize_like(x: jax.Array, ref: jax.Array, method: str = "linear",
                align_corners: bool = False) -> jax.Array:
    return resize_spatial(x, tuple(ref.shape[1:-1]), method=method,
                          align_corners=align_corners)


def resize_flow(flow: jax.Array, spatial: tuple[int, ...], method: str = "linear",
                align_corners: bool = False) -> jax.Array:
    """Resize a pixel-displacement field and rescale magnitudes per axis.

    The channel count must be a multiple of ``ndim`` — e.g. ``2*ndim`` for the
    stacked (F_t→0, F_t→1) flow that RIFE's IFBlocks carry (IFNet.py:92,115).
    """
    src = flow.shape[1:-1]
    ndim = len(src)
    if flow.shape[-1] % ndim:
        raise ValueError(f"flow channels {flow.shape[-1]} not a multiple of ndim {ndim}")
    out = resize_spatial(flow, spatial, method=method, align_corners=align_corners)
    ratios = jnp.asarray([t / s for t, s in zip(spatial, src)], out.dtype)
    return out * jnp.tile(ratios, flow.shape[-1] // ndim)


def upsample_flow_as(flow: jax.Array, ref: jax.Array, method: str = "linear") -> jax.Array:
    """UPFlow's ``upsample2d_flow_as(if_rate=True)`` (pwc_modules.py:77-90):
    match ``ref``'s spatial shape with align_corners=True, rescale values."""
    return resize_flow(flow, tuple(ref.shape[1:-1]), method=method,
                       align_corners=True)
