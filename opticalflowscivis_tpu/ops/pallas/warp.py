"""Fused backward-warp kernel (Pallas / TPU) — gather-free bilinear sampling.

Why: XLA lowers ``take_along_axis`` to a TPU gather that costs ~9 ns/element
(measured: a single 256^3 warp = 1.2 s), which makes warping dominate both RIFE
pipelines.  The TPU has no vector gather — the only fast path is to convert
random access into arithmetic.  This kernel does exact bilinear sampling as a
**one-hot matmul** on the MXU:

  For an output row-tile, the source rows live in a bounded window (displacement
  clamped to ±R).  Build A[p, q] = w_lo(p)·1[q = iy0(p)] + w_hi(p)·1[q = iy0(p)+1]
  (the y-interpolation matrix of the tile, via iota comparisons — pure VPU), then
  rows = A @ window  (MXU) interpolates along y for every column; a second
  one-hot mask X[p, xw] contracted elementwise interpolates along x.

Exactness domain: displacements with |flow| <= R (default 16) relative to each
output pixel; beyond that the sample clamps to the window edge (the jnp gather
path in ``ops.warp`` stays the general/unbounded reference and the CPU path).
SciVis flows are physically small (generator velocities <= 8 px/step,
Datasets/create_rectangle_2d.py:120-127), so R=16 covers the reference's data.

Backward pass: custom_vjp whose bwd uses the exact jnp formulation (correct but
gather-bound) — a fused backward kernel is a follow-up optimization.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tile(h: int, w: int, c: int, r: int) -> int | None:
    """Largest divisor TILE_H of H that fits the VMEM budget."""
    margin = r + 1
    wwin = w + 2 * margin
    for th in (32, 16, 8, 4, 2, 1):
        if h % th:
            continue
        p = th * w  # output pixels per tile
        thwin = th + 2 * margin
        a = _round_up(p, 8) * _round_up(thwin, 128) * 4
        win = _round_up(thwin, 8) * _round_up(wwin * c, 128) * 4
        rows = _round_up(p, 8) * _round_up(wwin * c, 128) * 4
        outb = _round_up(th, 8) * _round_up(w * c, 128) * 4
        flowb = _round_up(th, 8) * _round_up(w * 2, 128) * 4
        if (a + win + rows + outb + flowb) * 2 < _VMEM_BUDGET:
            return th
    return None


def warp2d_pallas_supported(img_shape: tuple, r: int = 16) -> bool:
    if len(img_shape) != 4:
        return False
    _, h, w, c = img_shape
    return _pick_tile(h, w, c, r) is not None


def _warp_kernel(r: int, th: int, w: int, c: int, padding: str,
                 img_ref, flow_ref, out_ref):
    """One row-chunk: img window [1, THwin, Wwin, C], flow [1, TH, W, 2] →
    out [1, TH, W, C].  Window = chunk rows padded by margin=r+1 on every side
    (edge padding done by the caller), so window coords = local + margin + flow.
    """
    margin = r + 1
    thwin = th + 2 * margin
    wwin = w + 2 * margin
    p = th * w

    flow = flow_ref[0].astype(jnp.float32)  # [TH, W, 2]
    fy = jnp.clip(flow[..., 0], -r, r)
    fx = jnp.clip(flow[..., 1], -r, r)

    row_local = jax.lax.broadcasted_iota(jnp.int32, (th, w), 0).astype(jnp.float32)
    col_local = jax.lax.broadcasted_iota(jnp.int32, (th, w), 1).astype(jnp.float32)
    wy = row_local + margin + fy  # window-space y in [1, thwin-2]
    wx = col_local + margin + fx

    iy0 = jnp.floor(wy)
    ay = wy - iy0
    ix0 = jnp.floor(wx)
    ax = wx - ix0

    # y-interpolation one-hot matrix A [P, THwin] (two taps folded in)
    q = jax.lax.broadcasted_iota(jnp.int32, (p, thwin), 1).astype(jnp.float32)
    iy0f = iy0.reshape(p, 1)
    ayf = ay.reshape(p, 1)
    a_mat = jnp.where(q == iy0f, 1.0 - ayf, 0.0) + jnp.where(q == iy0f + 1.0, ayf, 0.0)

    win = img_ref[0].astype(jnp.float32).reshape(thwin, wwin * c)
    rows = jnp.dot(a_mat, win, preferred_element_type=jnp.float32)  # [P, Wwin*C]

    # x-interpolation: two-tap mask X [P, Wwin] contracted over the window cols
    xw = jax.lax.broadcasted_iota(jnp.int32, (p, wwin), 1).astype(jnp.float32)
    ix0f = ix0.reshape(p, 1)
    axf = ax.reshape(p, 1)
    x_mat = jnp.where(xw == ix0f, 1.0 - axf, 0.0) + jnp.where(xw == ix0f + 1.0, axf, 0.0)

    if c == 1:
        out = jnp.sum(rows * x_mat, axis=1)  # [P]
        out_ref[0] = out.reshape(th, w, 1)
    else:
        rows3 = rows.reshape(p, wwin, c)
        out = jnp.sum(rows3 * x_mat[..., None], axis=1)  # [P, C]
        out_ref[0] = out.reshape(th, w, c)


def _forward(img, flow, r, padding):
    b, h, w, c = img.shape
    th = _pick_tile(h, w, c, r)
    if th is None:
        raise ValueError(f"shape {img.shape} does not tile into VMEM")
    margin = r + 1
    mode = "edge"  # border semantics; zeros handled via mask below
    img_pad = jnp.pad(
        img, [(0, 0), (margin, margin), (margin, margin), (0, 0)], mode=mode
    )

    thwin = th + 2 * margin
    wwin = w + 2 * margin
    call = pl.pallas_call(
        partial(_warp_kernel, r, th, w, c, padding),
        out_shape=jax.ShapeDtypeStruct((b, th, w, c), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, thwin, wwin, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w, 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * th * w * thwin * wwin * c,
            bytes_accessed=(b * thwin * wwin * c + 2 * b * th * w * (c + 2)) * 4,
            transcendentals=0,
        ),
    )

    chunks = []
    for j in range(h // th):
        win = jax.lax.slice_in_dim(img_pad, j * th, j * th + thwin, axis=1)
        fl = jax.lax.slice_in_dim(flow, j * th, (j + 1) * th, axis=1)
        chunks.append(call(win, fl))
    out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=1)

    if padding == "zeros":
        # Convert border (edge-clamped) values to zeros semantics: per axis the
        # edge-clamped sample equals img[valid corner], while zeros-padding
        # gives (in-bounds weight) * img[valid corner] — so multiplying by the
        # per-axis in-bounds weight fraction reproduces grid_sample zeros
        # exactly (including the 1-px partial-weight boundary band).
        def axis_weight(s, size):
            lo = jnp.floor(s)
            frac = s - lo
            w_lo = jnp.where((lo >= 0) & (lo <= size - 1), 1.0 - frac, 0.0)
            w_hi = jnp.where((lo + 1 >= 0) & (lo + 1 <= size - 1), frac, 0.0)
            return w_lo + w_hi

        base_y = jnp.arange(h, dtype=jnp.float32).reshape(1, h, 1)
        base_x = jnp.arange(w, dtype=jnp.float32).reshape(1, 1, w)
        vy = axis_weight(base_y + flow[..., 0].astype(jnp.float32), h)
        vx = axis_weight(base_x + flow[..., 1].astype(jnp.float32), w)
        out = out * (vy * vx)[..., None].astype(out.dtype)
    return out.astype(img.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def backward_warp_pallas(
    img: jax.Array, flow: jax.Array, r: int = 16, padding: str = "border"
) -> jax.Array:
    """Gather-free bilinear warp, exact for |flow| <= r (clamped beyond)."""
    return _forward(img, flow, r, padding)


def _fwd(img, flow, r, padding):
    return _forward(img, flow, r, padding), (img, flow)


def _bwd(r, padding, res, g):
    from opticalflowscivis_tpu.ops.warp import backward_warp

    img, flow = res
    flow_c = jnp.clip(flow, -r, r)

    def f(im, fl):
        return backward_warp(im, fl, padding=padding)

    _, vjp = jax.vjp(f, img, flow_c)
    dimg, dflow = vjp(g.astype(jnp.float32))
    return dimg.astype(img.dtype), dflow.astype(flow.dtype)


backward_warp_pallas.defvjp(_fwd, _bwd)


def backward_warp3d_bounded(
    img: jax.Array, flow: jax.Array, r_z: int = 8, r_yx: int = 16,
    padding: str = "border",
) -> jax.Array:
    """Gather-free trilinear warp for volumes, exact for bounded displacements.

    Decomposition: trilinear(img, (fz, fy, fx)) =
      Σ_s hat(fz - s) · bilinear2d(img[z+s], (fy, fx))  for s ∈ [-r_z-1, r_z+1]
    — the z interpolation is a (2·r_z+3)-tap weighted sum of z-shifted volumes,
    each bilinearly warped in-plane by the MXU one-hot kernel with the volume's
    z axis folded into the batch.  Exact for |flow_z| <= r_z and
    |flow_{y,x}| <= r_yx; displacement clamps beyond (SciVis velocities are
    <= 8 px/step, Datasets/create_data_3d.py:56-57).

    img: [B, Z, Y, X, C]; flow: [B, Z, Y, X, 3] row-major (dz, dy, dx).
    """
    b, z, y, x, c = img.shape
    fz = jnp.clip(flow[..., 0].astype(jnp.float32), -r_z, r_z)
    flow_yx = flow[..., 1:3].reshape(b * z, y, x, 2)

    mz = r_z + 1
    img_zpad = jnp.pad(img, [(0, 0), (mz, mz), (0, 0), (0, 0), (0, 0)],
                       mode="edge")

    out = jnp.zeros((b, z, y, x, c), jnp.float32)
    vz_sum = jnp.zeros((b, z, y, x, 1), jnp.float32) if padding == "zeros" else None
    for s in range(-mz, mz + 1):
        wz = jnp.maximum(0.0, 1.0 - jnp.abs(fz - s))  # hat weight, [B,Z,Y,X]
        shifted = jax.lax.slice_in_dim(img_zpad, s + mz, s + mz + z, axis=1)
        warped = backward_warp_pallas(
            shifted.reshape(b * z, y, x, c), flow_yx, r_yx, padding
        ).reshape(b, z, y, x, c)
        out = out + wz[..., None] * warped.astype(jnp.float32)
        if vz_sum is not None:
            zsrc = jnp.arange(z, dtype=jnp.float32).reshape(1, z, 1, 1) + s
            inb = ((zsrc >= 0) & (zsrc <= z - 1)).astype(jnp.float32)
            vz_sum = vz_sum + (wz * inb)[..., None]
    if vz_sum is not None:
        # zeros semantics along z: scale by the in-bounds z weight fraction
        # (the edge-padded taps contributed border values; vz rescales them out)
        total = jnp.clip(vz_sum, 0.0, 1.0)
        out = out * total
    return out.astype(img.dtype)
