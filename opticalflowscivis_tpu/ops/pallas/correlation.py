"""Fused cost-volume correlation kernel (Pallas / TPU).

TPU-native replacement for the reference's external CUDA extension
(``UPFlow/model/correlation_package``, invoked as ``CorrelationFunction.apply(
f1, f2, pad=4, kernel=1, max_disp=4, stride1=1, stride2=1, mult=1)``).

Why a kernel: the jnp formulation (ops/correlation.py) reads the padded f2
window from HBM once per displacement — (2*md+1)^2 = 81 passes over the feature
maps.  This kernel loads the f1 row-tile and its haloed f2 window into VMEM once
and computes all displacements from on-chip data, turning an HBM-bound op into a
VPU-bound one (~81x less HBM read traffic).

Design:
- grid (batch, H/TILE_H); f1 and the output are row-tiled via BlockSpec;
- f2 (pre-padded by ``max_disp``) stays in ANY/HBM memory space — the halo
  window rows [i*TILE_H, i*TILE_H + TILE_H + 2*md) are DMA'd into VMEM scratch
  manually (overlapping windows are not expressible as BlockSpecs);
- channels-last: C is the lane dim; the displacement loop is a static Python
  loop of VPU multiply-reduce ops in float32;
- backward via ``jax.custom_vjp``: the gradients are themselves local
  correlations (dL/df1[p,c] = Σ_k g[p,k]·f2p[p+d_k,c]/C; dL/df2 the transpose),
  expressed in jnp — a Pallas backward is a later optimization.
"""

from __future__ import annotations

import itertools
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024  # scoped VMEM limit is 16 MB; leave headroom


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tile_h(h: int, w: int, c: int, max_disp: int) -> int | None:
    """Largest divisor TILE_H of H whose working set fits the VMEM budget.

    Layout inside the kernel is channels-leading ``[C, TH, W]``: W is the lane
    dim (rounds up to 128), TH the sublane dim (rounds to 8).  This keeps every
    vector op at full 128-lane utilization regardless of C (which is 32-196 at
    the pyramid levels) and makes the per-displacement output write a full
    ``[TH, W]`` tile.  Budget x2 for pipeline double buffering.
    """
    d = (2 * max_disp + 1) ** 2
    wl = _round_up(w, 128)
    wpl = _round_up(w + 2 * max_disp, 128)
    for th in range(min(h, 64), 0, -1):
        if h % th:
            continue
        th8 = _round_up(th, 8)
        thp8 = _round_up(th + 2 * max_disp, 8)
        f1 = c * th8 * wl * 4
        f2win = c * thp8 * wpl * 4
        out = d * th8 * wl * 4
        if (f1 + f2win + out) * 2 < _VMEM_BUDGET:
            return th
    return None


def pallas_cost_volume_supported(shape: tuple, max_disp: int) -> bool:
    """True if the fused kernel handles this shape (2-D, tileable into VMEM)."""
    if os.environ.get("OFS_NO_PALLAS"):  # debug escape hatch (kernel-fault triage)
        return False
    if len(shape) != 4:  # [B, H, W, C] only; 3-D uses the jnp path for now
        return False
    _, h, w, c = shape
    # In-context measurement (scripts/pallas_gate_ab2.py, round 5): the fused
    # kernel LOSES to XLA's fused matmul formulation at every decode-level
    # plane of the KITTI protocol (<= 64x208 = 13312 px) — UPFlow train goes
    # 20.9 -> 27.2 pairs/s when they run on XLA — so the default gate keeps
    # Pallas only for larger planes.  OFS_PALLAS_CORR_MIN_HW overrides
    # OFS_PALLAS_MIN_HW overrides the default.
    gate = os.environ.get("OFS_PALLAS_CORR_MIN_HW",
                          os.environ.get("OFS_PALLAS_MIN_HW", "16384"))
    if h * w < int(gate):
        return False
    return _pick_tile_h(h, w, c, max_disp) is not None


def _corr_kernel(md: int, c: int, f1_ref, f2w_ref, out_ref):
    """One row chunk, channels-leading: f1 [1,C,TH,W], f2 window
    [1,C,TH+2md,W+2md] → out [1,D,TH,W].

    The displacement loop unrolls statically; each iteration is a full-lane
    multiply + a C-step sublane-dim reduction + one full-tile write (md/c are
    bound via functools.partial).
    """
    h, w = f1_ref.shape[2], f1_ref.shape[3]
    f1 = f1_ref[0].astype(jnp.float32)  # [C, TH, W]
    f2p = f2w_ref[0].astype(jnp.float32)  # [C, TH+2md, W+2md]
    inv_c = 1.0 / c
    k = 0
    for dy, dx in itertools.product(range(2 * md + 1), repeat=2):
        win = f2p[:, dy : dy + h, dx : dx + w]
        out_ref[0, k] = jnp.sum(f1 * win, axis=0) * inv_c
        k += 1


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def cost_volume_pallas(f1: jax.Array, f2: jax.Array, max_disp: int = 4) -> jax.Array:
    """Fused local cost volume: ``[B, H, W, C] x2 → [B, H, W, (2md+1)^2]``."""
    return _forward(f1, f2, max_disp)


def _forward(f1, f2, max_disp):
    b, h, w, c = f1.shape
    md = max_disp
    d = (2 * md + 1) ** 2
    th = _pick_tile_h(h, w, c, md)
    if th is None:
        raise ValueError(f"shape {f1.shape} does not tile into VMEM")
    # channels-leading layout for full-lane VPU math (one XLA transpose each way)
    f1_t = jnp.moveaxis(f1, -1, 1)  # [B, C, H, W]
    f2p_t = jnp.pad(
        jnp.moveaxis(f2, -1, 1), [(0, 0), (0, 0), (md, md), (md, md)]
    )

    call = pl.pallas_call(
        partial(_corr_kernel, md, c),
        out_shape=jax.ShapeDtypeStruct((b, d, th, w), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, th, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, th + 2 * md, w + 2 * md), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, th, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * th * w * c * d,
            bytes_accessed=(b * th * w * c * 2 + b * th * w * d) * 4,
            transcendentals=0,
        ),
    )

    # Halo slicing happens in XLA: each row chunk gets its overlapping f2p
    # window as a plain (fused) slice — sidesteps Mosaic's DMA alignment
    # constraints.  Same chunk shape → one kernel compilation, H/th launches.
    chunks = []
    for j in range(h // th):
        f1_chunk = jax.lax.slice_in_dim(f1_t, j * th, (j + 1) * th, axis=2)
        f2_win = jax.lax.slice_in_dim(f2p_t, j * th, j * th + th + 2 * md, axis=2)
        chunks.append(call(f1_chunk, f2_win))
    out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=2)
    return jnp.moveaxis(out, 1, -1).astype(f1.dtype)  # [B, H, W, D]


def _forward_fwd(f1, f2, max_disp):
    return _forward(f1, f2, max_disp), (f1, f2)


def _forward_bwd(max_disp, res, g):
    f1, f2 = res
    md = max_disp
    c = f1.shape[-1]
    g = g.astype(jnp.float32)
    f1_32 = f1.astype(jnp.float32)
    f2p = jnp.pad(f2.astype(jnp.float32), [(0, 0), (md, md), (md, md), (0, 0)])
    h, w = f1.shape[1], f1.shape[2]

    df1 = jnp.zeros_like(f1_32)
    df2p = jnp.zeros_like(f2p)
    k = 0
    for dy, dx in itertools.product(range(2 * md + 1), repeat=2):
        gk = g[..., k : k + 1] / c  # [B, H, W, 1]
        win = f2p[:, dy : dy + h, dx : dx + w, :]
        df1 = df1 + gk * win
        df2p = df2p.at[:, dy : dy + h, dx : dx + w, :].add(gk * f1_32)
        k += 1
    df2 = df2p[:, md : md + h, md : md + w, :]
    return df1.astype(f1.dtype), df2.astype(f2.dtype)


cost_volume_pallas.defvjp(_forward_fwd, _forward_bwd)
