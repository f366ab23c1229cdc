"""Pallas TPU kernels — the native fast paths of the framework.

These are the TPU equivalents of the reference's native layer (SURVEY.md §2.5):
the external ``correlation_cuda`` CUDA extension becomes a fused VMEM-resident
cost-volume kernel; every op keeps a pure-jnp twin in ``ops/`` (the reference
itself establishes this dual-implementation pattern via ``Corr_pyTorch`` vs
``correlation_cuda``) which doubles as the CPU path and the test oracle.
"""

from opticalflowscivis_tpu.ops.pallas.correlation import (
    cost_volume_pallas,
    pallas_cost_volume_supported,
)

__all__ = ["cost_volume_pallas", "pallas_cost_volume_supported"]
