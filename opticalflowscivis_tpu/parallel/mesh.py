"""Device mesh + sharding helpers.

Axes:
- ``data``  — data parallelism (the reference's only strategy: DDP over NCCL,
  Flow-2D/train.py:567).  Gradients are reduced by XLA (psum over ICI) because
  the loss is computed on a batch sharded over this axis under jit.
- ``space`` — optional spatial sharding of 3-D volumes (the framework's
  context-parallel analogue for 256^3 inputs; reference had to downsample to
  64^3 instead, Datasets/read_data.py:149-159).  Used by ``parallel.spatial``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_space: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data, space) mesh; defaults to all devices on the data axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // n_space
    devices = devices[: n_data * n_space].reshape(n_data, n_space)
    return Mesh(devices, ("data", "space"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch sharded over the data axis."""
    return jax.device_put(batch, batch_sharding(mesh))
