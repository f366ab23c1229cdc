"""Distributed runtime: device meshes, shardings, spatial (halo) parallelism.

TPU-native replacement for the reference's NCCL/DDP layer
(Flow-2D/train.py:567, Flow-2D/model/RIFE.py:31-32): a jitted train step over a
``jax.sharding.Mesh`` — gradient allreduce becomes an XLA ``psum`` over ICI,
multi-host comes from ``jax.distributed.initialize`` with the same mesh.
"""

from opticalflowscivis_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch"]
