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


def resize_spatial(x: jax.Array, spatial: tuple[int, ...], method: str = "linear") -> jax.Array:
    """Resize ``[B, *S, C]`` to ``[B, *spatial, C]`` (half-pixel / align_corners=False)."""
    out_shape = (x.shape[0], *spatial, x.shape[-1])
    if out_shape == x.shape:
        return x
    return jax.image.resize(x, out_shape, method=method)


def resize_like(x: jax.Array, ref: jax.Array, method: str = "linear") -> jax.Array:
    return resize_spatial(x, tuple(ref.shape[1:-1]), method=method)


def resize_flow(flow: jax.Array, spatial: tuple[int, ...], method: str = "linear") -> jax.Array:
    """Resize a pixel-displacement field and rescale magnitudes per axis.

    The channel count must be a multiple of ``ndim`` — e.g. ``2*ndim`` for the
    stacked (F_t→0, F_t→1) flow that RIFE's IFBlocks carry (IFNet.py:92,115).
    """
    src = flow.shape[1:-1]
    ndim = len(src)
    if flow.shape[-1] % ndim:
        raise ValueError(f"flow channels {flow.shape[-1]} not a multiple of ndim {ndim}")
    out = resize_spatial(flow, spatial, method=method)
    ratios = jnp.asarray([t / s for t, s in zip(spatial, src)], out.dtype)
    return out * jnp.tile(ratios, flow.shape[-1] // ndim)


def upsample_flow_as(flow: jax.Array, ref: jax.Array, method: str = "linear") -> jax.Array:
    """UPFlow's ``upsample2d_flow_as``: match ``ref``'s spatial shape, rescale values."""
    return resize_flow(flow, tuple(ref.shape[1:-1]), method=method)
