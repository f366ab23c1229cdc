"""Local cost-volume correlation (PWC/UPFlow style).

Semantics match the reference's external ``correlation_cuda`` extension invoked as
``CorrelationFunction.apply(f1, f2, pad=4, kernel=1, max_disp=4, stride1=1,
stride2=1, corr_mult=1)`` (UPFlow/model/correlation_package/correlation.py:6-45)
and its pure-torch fallback ``Corr_pyTorch`` (UPFlow/utils/pytorch_correlation.py):
for every integer displacement d in [-max_disp, max_disp]^ndim,

    out[b, p, k(d)] = mean_c( f1[b, p, c] * f2[b, p + d, c] )

with zero padding outside f2.  2-D with max_disp=4 gives 81 output channels.

The displacement axis is ordered row-major over (d_axis0, d_axis1, ...) — i.e.
(dy, dx) in 2-D, matching an unfold over a zero-padded f2.

This jnp version is the readable reference (shift + multiply + channel-mean,
which XLA fuses into 81 elementwise passes).  The fused Pallas kernel
(`ops.pallas.correlation`) loads the f1/f2 tiles into VMEM once and computes all
displacements from on-chip data — the TPU equivalent of the CUDA kernel.
"""

from __future__ import annotations

import itertools
from functools import partial

import jax
import jax.numpy as jnp


def cost_volume(
    f1: jax.Array, f2: jax.Array, max_disp: int = 4, backend: str = "auto"
) -> jax.Array:
    """Correlation volume of two feature maps.

    Args:
      f1, f2: ``[B, *spatial, C]`` feature maps (channels-last).
      max_disp: search radius; output has ``(2*max_disp+1)**ndim`` channels.
      backend: 'auto' picks the fused Pallas kernel on TPU for supported 2-D
        shapes (ops/pallas/correlation.py) and the jnp path otherwise;
        'jnp' / 'pallas' force a path.

    Returns:
      ``[B, *spatial, (2*max_disp+1)**ndim]`` mean-dot-product similarities.
    """
    if backend != "jnp":
        from opticalflowscivis_tpu.ops.pallas.correlation import (
            cost_volume_pallas,
            pallas_cost_volume_supported,
        )

        on_tpu = jax.default_backend() == "tpu"
        ok = pallas_cost_volume_supported(f1.shape, max_disp)
        if backend == "pallas" or (backend == "auto" and on_tpu and ok):
            return cost_volume_pallas(f1, f2, max_disp)
    return _cost_volume_jnp(f1, f2, max_disp)


@partial(jax.jit, static_argnames=("max_disp",))
def _cost_volume_jnp(f1: jax.Array, f2: jax.Array, max_disp: int = 4) -> jax.Array:
    """Readable jnp reference path (⇔ Corr_pyTorch); rank-generic."""
    if f1.shape != f2.shape:
        raise ValueError(f"shape mismatch: {f1.shape} vs {f2.shape}")
    spatial = f1.shape[1:-1]
    ndim = len(spatial)
    c = f1.shape[-1]
    compute_dtype = jnp.promote_types(f1.dtype, jnp.float32)
    f1 = f1.astype(compute_dtype)

    pad = [(0, 0)] + [(max_disp, max_disp)] * ndim + [(0, 0)]
    f2p = jnp.pad(f2.astype(compute_dtype), pad)

    outs = []
    for disp in itertools.product(range(2 * max_disp + 1), repeat=ndim):
        sl = tuple(
            [slice(None)]
            + [slice(d, d + s) for d, s in zip(disp, spatial)]
            + [slice(None)]
        )
        outs.append(jnp.sum(f1 * f2p[sl], axis=-1) / c)
    return jnp.stack(outs, axis=-1).astype(f1.dtype)
