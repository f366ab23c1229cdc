"""Spatial sharding of volumetric inputs — the framework's context parallelism.

The reference could not train on Droplet-3D at native 256^3 and downsampled
everything to 64^3 (Datasets/read_data.py:149-159).  The TPU-native answer is to
shard the volume's depth axis across a ``space`` mesh axis and let GSPMD
partition the convolutions (XLA inserts the halo exchanges over ICI) — batch
parallelism rides the ``data`` axis as usual.

Two layers of support:
- ``volume_batch_sharding``: NamedSharding placing ``[B, slots, D, H, W, C]``
  batches as P('data', None, 'space') — used by ``Trainer`` when
  ``TrainConfig.spatial_shard`` is on.  Everything else (params replicated,
  jitted step) is unchanged; XLA propagates the sharding through the IFNet-3D
  convs/warps and inserts collectives.
- ``halo_exchange``: explicit neighbor-slice exchange via ``ppermute`` for
  shard_map-based kernels (the manual path).
- ``backward_warp3d_sharded``: the shard_map consumer — depth-sharded exact
  trilinear slab warp whose only communication is the 2·(r_z+1)-slice halo.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opticalflowscivis_tpu.ops.warp import _slab_warp_core


def volume_batch_sharding(mesh: Mesh, n_leading: int = 2) -> NamedSharding:
    """Shard batch axis over 'data' and the first spatial axis over 'space'.

    ``n_leading`` counts axes before the spatial dims (2 for tuple batches
    ``[B, slots, *S, C]``, 1 for plain ``[B, *S, C]``).
    """
    spec = ["data"] + [None] * (n_leading - 1) + ["space"]
    return NamedSharding(mesh, P(*spec))


def halo_exchange(
    x: jax.Array, axis_name: str, halo: int, dim: int = 0, boundary: str = "shift"
) -> jax.Array:
    """Pad a shard with ``halo`` slices from each neighbor along a mesh axis.

    For use inside ``shard_map``: returns x extended by the right edge of the
    left neighbor and the left edge of the right neighbor.  At the global
    boundary shards the halo is filled by ``boundary``:

    - ``'shift'``: the shard's own first/last ``halo`` slices (the full-array
      analogue is ``concat([x[:halo], x, x[-halo:]])``);
    - ``'edge'``: the outermost slice repeated ``halo`` times — matching
      ``jnp.pad(mode='edge')`` of the full array, i.e. grid-sample 'border'
      semantics (what ``ops.backward_warp3d_slab`` pads with).
    """
    if boundary not in ("shift", "edge"):
        raise ValueError(f"boundary must be 'shift' or 'edge', got {boundary!r}")
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    right_edge = jax.lax.slice_in_dim(x, x.shape[dim] - halo, x.shape[dim], axis=dim)
    left_edge = jax.lax.slice_in_dim(x, 0, halo, axis=dim)

    # send my right edge to my right neighbor (it becomes their left halo)
    from_left = jax.lax.ppermute(
        right_edge, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    # send my left edge to my left neighbor (it becomes their right halo)
    from_right = jax.lax.ppermute(
        left_edge, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )

    # boundary shards: fill the halo from the shard's own data
    if boundary == "shift":
        own_left = jax.lax.slice_in_dim(x, 0, halo, axis=dim)
        own_right = jax.lax.slice_in_dim(x, x.shape[dim] - halo, x.shape[dim], axis=dim)
    else:  # edge-repeat of the outermost slice
        reps = [1] * x.ndim
        reps[dim] = halo
        own_left = jnp.tile(jax.lax.slice_in_dim(x, 0, 1, axis=dim), reps)
        own_right = jnp.tile(
            jax.lax.slice_in_dim(x, x.shape[dim] - 1, x.shape[dim], axis=dim), reps
        )
    from_left = jnp.where(idx == 0, own_left, from_left)
    from_right = jnp.where(idx == n - 1, own_right, from_right)

    return jnp.concatenate([from_left, x, from_right], axis=dim)


def backward_warp3d_sharded(
    img: jax.Array,
    flow: jax.Array,
    mesh: Mesh,
    r_z: int = 8,
    padding: str = "border",
    r_yx: int = 0,
    remat_taps: bool = False,
    data_axis: str | None = "data",
    space_axis: str = "space",
) -> jax.Array:
    """Depth-sharded trilinear slab warp — halo exchange over ICI, local MXU warps.

    The shard_map consumer of ``halo_exchange``: the volume's z axis lives
    sharded over ``space_axis`` (batch over ``data_axis``), each device
    exchanges ``r_z + 1`` boundary slices with its mesh neighbors via
    ``ppermute`` and then runs the exact slab decomposition
    (``ops.backward_warp3d_slab``) entirely locally — no all-gather of the
    volume, communication is 2·(r_z+1)/Z_local of the shard per warp.
    Bit-identical to the unsharded slab warp for any flow with |flow_z| <= r_z
    (flow_z is clamped beyond, same as the unsharded path); differentiable
    (ppermute has a transpose rule).

    img: [B, Z, Y, X, C]; flow: [B, Z, Y, X, 3] row-major (dz, dy, dx), both
    laid out P(data_axis, space_axis) — the result has the same layout.
    Requires Z_local = Z / n_space >= r_z + 1.
    """
    from jax import shard_map

    mz = r_z + 1
    n_space = mesh.shape[space_axis]
    z = img.shape[1]
    if z % n_space != 0 or z // n_space < mz:
        raise ValueError(
            f"depth {z} must split into {n_space} shards of >= r_z+1={mz} slices"
        )
    z_local = z // n_space
    spec = P(data_axis, space_axis, None, None, None)

    vary = tuple(a for a in (data_axis, space_axis) if a is not None)

    def local_warp(img_l, flow_l):
        img_zpad = halo_exchange(img_l, space_axis, mz, dim=1, boundary="edge")
        z0 = jax.lax.axis_index(space_axis) * z_local
        return _slab_warp_core(
            img_zpad, flow_l, r_z, padding, r_yx, remat_taps,
            z0=z0, z_total=z, vary_axes=vary,
        )

    return shard_map(
        local_warp, mesh=mesh, in_specs=(spec, spec), out_specs=spec
    )(img, flow)
