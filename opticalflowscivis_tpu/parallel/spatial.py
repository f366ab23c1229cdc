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
  shard_map-based kernels (the manual path, used by future Pallas 3-D ops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def volume_batch_sharding(mesh: Mesh, n_leading: int = 2) -> NamedSharding:
    """Shard batch axis over 'data' and the first spatial axis over 'space'.

    ``n_leading`` counts axes before the spatial dims (2 for tuple batches
    ``[B, slots, *S, C]``, 1 for plain ``[B, *S, C]``).
    """
    spec = ["data"] + [None] * (n_leading - 1) + ["space"]
    return NamedSharding(mesh, P(*spec))


def halo_exchange(x: jax.Array, axis_name: str, halo: int, dim: int = 0) -> jax.Array:
    """Pad a shard with ``halo`` slices from each neighbor along a mesh axis.

    For use inside ``shard_map``: returns x extended by the right edge of the
    left neighbor and the left edge of the right neighbor (edge-clamped at the
    boundary shards, matching 'border'/edge-pad semantics of the full array).
    """
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

    # boundary shards: clamp with their own edge (edge padding of the full array)
    own_left = jax.lax.slice_in_dim(x, 0, halo, axis=dim)
    own_right = jax.lax.slice_in_dim(x, x.shape[dim] - halo, x.shape[dim], axis=dim)
    from_left = jnp.where(idx == 0, own_left, from_left)
    from_right = jnp.where(idx == n - 1, own_right, from_right)

    return jnp.concatenate([from_left, x, from_right], axis=dim)
