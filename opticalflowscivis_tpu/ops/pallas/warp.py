"""Fused backward-warp kernel (Pallas / TPU) — gather-free bilinear sampling.

Why: XLA lowers warp gathers to per-element random access (~47 ms for one
32x160x224 warp on v5e, materialized timing), making warping dominate both RIFE
pipelines.  The TPU has no vector gather — the fast path converts random access
into arithmetic.  This kernel does exact bilinear sampling as a **one-hot
matmul** on the MXU.

Transposed formulation (pixels on the LANE dim): for an output row-chunk of
P = TILE_H*W pixels whose sources live in a ±R window,

  A_T[q, p] = (1-ay_p)·1[q = iy0_p] + ay_p·1[q = iy0_p + 1]      [THwin, P]
  rows_T    = win_T @ A_T  via dot_general(win, A_T, contract THwin)  [Wwin*C, P]
  X_T[l, p] = (1-ax_p)·1[l//C = ix0_p] + ax_p·1[l//C = ix0_p+1]  [Wwin*C, P]
  out[k, p] = Σ_l 1[l%C = k] · rows_T[l, p] · X_T[l, p]

Layout rationale (all learned the hard way, see CLAUDE.md):
- Mosaic rejects lane-crossing reshapes → per-pixel coords are flattened by
  XLA and carried as [..., 4, P] (P on lanes: no tile-padding blowup — the
  [..., P, 4] orientation padded 4→128 lanes and ghosted 8 GB of HBM at 256³);
- halo windows are XLA slices feeding a (batch, chunk) kernel grid;
- orientation changes ride dot_general dimension numbers, never transposes.

Exactness domain: |flow| <= R (default 16); displacement clamps beyond (the jnp
gather path in ``ops.warp`` is the general reference and CPU path).  SciVis
flows are <= 8 px/step (create_rectangle_2d.py:120-127).

Backward: fused Pallas kernel for border mode (dwin = A @ GXᵀ; dflow via
derivative one-hots); zeros mode falls back to the jnp vjp.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tile(h: int, w: int, c: int, r: int) -> int | None:
    """Largest divisor TILE_H of H that fits the VMEM budget."""
    margin = r + 1
    wwin = w + 2 * margin
    for th in (32, 16, 8, 4, 2, 1):
        if h % th:
            continue
        p = th * w
        thwin = th + 2 * margin
        pl_ = _round_up(p, 128)
        a = _round_up(thwin, 8) * pl_ * 4
        win = _round_up(thwin, 8) * _round_up(wwin * c, 128) * 4
        rows = _round_up(wwin * c, 8) * pl_ * 4
        xmask = rows
        outb = _round_up(c, 8) * pl_ * 4
        coeff = 8 * pl_ * 4
        if (a + win + rows + xmask + outb + coeff) * 2 < _VMEM_BUDGET:
            return th
    return None


def warp2d_pallas_supported(img_shape: tuple, r: int = 16) -> bool:
    if os.environ.get("OFS_NO_PALLAS"):  # debug escape hatch (kernel-fault triage)
        return False
    if len(img_shape) != 4:
        return False
    _, h, w, c = img_shape
    # Small planes (coarse pyramid levels, e.g. 4x13 at 1/64 of a KITTI crop)
    # don't amortize the kernel's DMA/launch cost and XLA handles their
    # gathers in microseconds; measured threshold sweeps:
    # scripts/upflow_step_ab.py (global) and scripts/pallas_gate_ab2.py
    # (per-op).  OFS_PALLAS_WARP_MIN_HW overrides OFS_PALLAS_MIN_HW.
    gate = os.environ.get("OFS_PALLAS_WARP_MIN_HW",
                          os.environ.get("OFS_PALLAS_MIN_HW", "1024"))
    if h * w < int(gate):
        return False
    return _pick_tile(h, w, c, r) is not None


def _onehots(coef, p, thwin, wwin, c):
    """Shared one-hot builders; coef block [1,1,4,P] → masks with P on lanes."""
    iy0 = coef[0:1, :]  # [1, P]
    ay = coef[1:2, :]
    ix0 = coef[2:3, :]
    ax = coef[3:4, :]
    q = jax.lax.broadcasted_iota(jnp.int32, (thwin, p), 0).astype(jnp.float32)
    oh_y_lo = jnp.where(q == iy0, 1.0, 0.0)
    oh_y_hi = jnp.where(q == iy0 + 1.0, 1.0, 0.0)
    a_t = oh_y_lo * (1.0 - ay) + oh_y_hi * ay  # [THwin, P]
    sub = jax.lax.broadcasted_iota(jnp.int32, (wwin * c, p), 0)
    col = (sub // c).astype(jnp.float32)
    oh_x_lo = jnp.where(col == ix0, 1.0, 0.0)
    oh_x_hi = jnp.where(col == ix0 + 1.0, 1.0, 0.0)
    x_t = oh_x_lo * (1.0 - ax) + oh_x_hi * ax  # [Wwin*C, P]
    return a_t, x_t, (oh_y_lo, oh_y_hi, oh_x_lo, oh_x_hi), sub


def _warp_kernel(thwin: int, wwin: int, c: int, win_ref, coef_ref, out_ref):
    """win [1,1,THwin,Wwin*C]; coef [1,1,4,P]; out [1,1,C,P]."""
    p = coef_ref.shape[3]
    coef = coef_ref[0, 0]
    a_t, x_t, _, sub = _onehots(coef, p, thwin, wwin, c)
    win = win_ref[0, 0].astype(jnp.float32)  # [THwin, Wwin*C]
    rows_t = jax.lax.dot_general(
        win, a_t, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Wwin*C, P]
    prod = rows_t * x_t
    if c == 1:
        out_ref[0, 0, 0, :] = jnp.sum(prod, axis=0)
    else:
        ch = sub % c  # [Wwin*C, P] sublane channel ids
        for k in range(c):
            out_ref[0, 0, k, :] = jnp.sum(jnp.where(ch == k, prod, 0.0), axis=0)


def _bwd_kernel(thwin: int, wwin: int, c: int, win_ref, coef_ref, g_ref,
                dwin_ref, dcoef_ref):
    """win [1,1,THwin,Wwin*C]; coef [1,1,4,P]; g [1,1,C,P] →
    dwin [1,1,THwin,Wwin*C]; dcoef [1,1,2,P] = (dwy, dwx)."""
    p = coef_ref.shape[3]
    coef = coef_ref[0, 0]
    a_t, x_t, (oh_y_lo, oh_y_hi, oh_x_lo, oh_x_hi), sub = _onehots(
        coef, p, thwin, wwin, c
    )
    win = win_ref[0, 0].astype(jnp.float32)
    g = g_ref[0, 0].astype(jnp.float32)  # [C, P]

    if c == 1:
        g_cols = g[0:1, :]  # broadcast over sublanes
        gx_t = x_t * g_cols
    else:
        ch = sub % c
        gx_t = jnp.zeros((wwin * c, p), jnp.float32)
        for k in range(c):
            gx_t = gx_t + jnp.where(ch == k, x_t * g[k : k + 1, :], 0.0)

    # dwin [THwin, Wwin*C] = A @ GXᵀ → contract P
    dwin_ref[0, 0] = jax.lax.dot_general(
        a_t, gx_t, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # dA_T [THwin, P] = win @ GX_T (contract window columns)
    d_a_t = jax.lax.dot_general(
        win, gx_t, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dcoef_ref[0, 0, 0, :] = jnp.sum(d_a_t * (oh_y_hi - oh_y_lo), axis=0)

    rows_t = jax.lax.dot_general(
        win, a_t, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if c == 1:
        rows_g = rows_t * g[0:1, :]
    else:
        ch = sub % c
        rows_g = jnp.zeros((wwin * c, p), jnp.float32)
        for k in range(c):
            rows_g = rows_g + jnp.where(ch == k, rows_t * g[k : k + 1, :], 0.0)
    dcoef_ref[0, 0, 1, :] = jnp.sum(rows_g * (oh_x_hi - oh_x_lo), axis=0)


def _prep(img, flow, r, th):
    """Shared XLA-side prep: padded windows + transposed flattened coords."""
    b, h, w, c = img.shape
    margin = r + 1
    thwin = th + 2 * margin
    p = th * w
    n_chunks = h // th

    img_pad = jnp.pad(
        img, [(0, 0), (margin, margin), (margin, margin), (0, 0)], mode="edge"
    )
    flow_f = jnp.clip(flow.astype(jnp.float32), -r, r)
    row_local = jax.lax.broadcasted_iota(jnp.float32, (1, n_chunks, th, w), 2)
    col_local = jax.lax.broadcasted_iota(jnp.float32, (1, n_chunks, th, w), 3)
    fl = flow_f.reshape(b, n_chunks, th, w, 2)
    wy = row_local + margin + fl[..., 0]
    wx = col_local + margin + fl[..., 1]
    iy0 = jnp.floor(wy)
    ix0 = jnp.floor(wx)
    coefs = jnp.stack([iy0, wy - iy0, ix0, wx - ix0], axis=2).reshape(
        b, n_chunks, 4, p
    )
    windows = jnp.stack(
        [
            jax.lax.slice_in_dim(img_pad, j * th, j * th + thwin, axis=1)
            for j in range(n_chunks)
        ],
        axis=1,
    ).reshape(b, n_chunks, thwin, (w + 2 * margin) * c)
    return windows, coefs, flow_f


def _forward(img, flow, r, padding):
    b, h, w, c = img.shape
    th = _pick_tile(h, w, c, r)
    if th is None:
        raise ValueError(f"shape {img.shape} does not tile into VMEM")
    margin = r + 1
    thwin = th + 2 * margin
    wwin = w + 2 * margin
    p = th * w
    n_chunks = h // th
    windows, coefs, flow_f = _prep(img, flow, r, th)

    out = pl.pallas_call(
        partial(_warp_kernel, thwin, wwin, c),
        out_shape=jax.ShapeDtypeStruct((b, n_chunks, c, p), jnp.float32),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, thwin, wwin * c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4, p), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, c, p), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_chunks * p * thwin * wwin * c,
            bytes_accessed=b * n_chunks * (thwin * wwin * c + p * (4 + c)) * 4,
            transcendentals=0,
        ),
    )(windows, coefs)
    # [B, n_chunks, C, P] → [B, H, W, C]
    out = jnp.moveaxis(out.reshape(b, n_chunks, c, th, w), 2, 4).reshape(
        b, h, w, c
    )

    if padding == "zeros":
        # Convert border (edge-clamped) values to zeros semantics: the clamped
        # corner equals its in-bounds twin at the boundary, so scaling by the
        # per-axis in-bounds weight fraction is exact.
        def axis_weight(s, size):
            lo = jnp.floor(s)
            frac = s - lo
            w_lo = jnp.where((lo >= 0) & (lo <= size - 1), 1.0 - frac, 0.0)
            w_hi = jnp.where((lo + 1 >= 0) & (lo + 1 <= size - 1), frac, 0.0)
            return w_lo + w_hi

        base_y = jnp.arange(h, dtype=jnp.float32).reshape(1, h, 1)
        base_x = jnp.arange(w, dtype=jnp.float32).reshape(1, 1, w)
        vy = axis_weight(base_y + flow_f[..., 0], h)
        vx = axis_weight(base_x + flow_f[..., 1], w)
        out = out * (vy * vx)[..., None]
    return out.astype(img.dtype)


def _backward_fused(img, flow, r, g):
    """Border-mode fused backward pass (same tiling as the forward)."""
    b, h, w, c = img.shape
    th = _pick_tile(h, w, c, r)
    margin = r + 1
    thwin = th + 2 * margin
    wwin = w + 2 * margin
    p = th * w
    n_chunks = h // th
    windows, coefs, flow_f = _prep(img, flow, r, th)
    # cotangent → [B, n_chunks, C, P]
    g4 = jnp.moveaxis(
        g.astype(jnp.float32).reshape(b, n_chunks, th, w, c), 4, 2
    ).reshape(b, n_chunks, c, p)

    dwin, dcoef = pl.pallas_call(
        partial(_bwd_kernel, thwin, wwin, c),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_chunks, thwin, wwin * c), jnp.float32),
            jax.ShapeDtypeStruct((b, n_chunks, 2, p), jnp.float32),
        ),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, thwin, wwin * c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4, p), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c, p), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, thwin, wwin * c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, p), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(windows, coefs, g4)

    # overlap-add the window grads into the padded image, then fold the
    # edge-padding adjoint (margins accumulate onto the border pixels)
    dwin = dwin.reshape(b, n_chunks, thwin, wwin, c)
    dimg_pad = jnp.zeros((b, h + 2 * margin, w + 2 * margin, c), jnp.float32)
    for j in range(n_chunks):
        dimg_pad = jax.lax.dynamic_update_slice_in_dim(
            dimg_pad,
            jax.lax.dynamic_slice_in_dim(dimg_pad, j * th, thwin, axis=1)
            + dwin[:, j],
            j * th,
            axis=1,
        )
    top = jnp.sum(dimg_pad[:, : margin + 1], axis=1, keepdims=True)
    bot = jnp.sum(dimg_pad[:, -(margin + 1) :], axis=1, keepdims=True)
    mid = dimg_pad[:, margin + 1 : -(margin + 1)]
    dimg_rows = jnp.concatenate([top, mid, bot], axis=1)
    left = jnp.sum(dimg_rows[:, :, : margin + 1], axis=2, keepdims=True)
    right = jnp.sum(dimg_rows[:, :, -(margin + 1) :], axis=2, keepdims=True)
    dimg = jnp.concatenate(
        [left, dimg_rows[:, :, margin + 1 : -(margin + 1)], right], axis=2
    )

    dcoef = jnp.moveaxis(dcoef.reshape(b, n_chunks, 2, th, w), 2, 4).reshape(
        b, h, w, 2
    )
    # clip adjoint: zero gradient where the displacement was clamped
    inside = (jnp.abs(flow.astype(jnp.float32)) < r).astype(jnp.float32)
    dflow = dcoef * inside
    return dimg, dflow


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def backward_warp_pallas(
    img: jax.Array, flow: jax.Array, r: int = 16, padding: str = "border"
) -> jax.Array:
    """Gather-free bilinear warp, exact for |flow| <= r (clamped beyond)."""
    return _forward(img, flow, r, padding)


def _fwd(img, flow, r, padding):
    return _forward(img, flow, r, padding), (img, flow)


def _bwd(r, padding, res, g):
    img, flow = res
    if padding == "border":
        dimg, dflow = _backward_fused(img, flow, r, g)
        return dimg.astype(img.dtype), dflow.astype(flow.dtype)

    # zeros mode, fused: zeros(img, flow) = border(img, flow) * V(flow) where
    # V is the separable per-axis in-bounds weight fraction (see _forward), so
    #   d/dimg  = border_bwd_img(g * V)
    #   d/dflow = border_bwd_flow(g * V) + <g, border(img, flow)> * dV/dflow.
    # This keeps the whole VJP on the MXU kernels — the previous exact-jnp
    # fallback re-introduced the bilinear gathers this kernel exists to avoid
    # (measured round 5: the b64 128^2 RIFE train step spent ~100 ms of its
    # 184 ms in photometric_loss's gather warps).
    b, h, w, c = img.shape
    flow_f = jnp.clip(flow.astype(jnp.float32), -r, r)
    gf = g.astype(jnp.float32)

    def axis_w(s, size):
        lo = jnp.floor(s)
        frac = s - lo
        in_lo = (lo >= 0) & (lo <= size - 1)
        in_hi = (lo + 1 >= 0) & (lo + 1 <= size - 1)
        wv = jnp.where(in_lo, 1.0 - frac, 0.0) + jnp.where(in_hi, frac, 0.0)
        # d(wv)/ds away from integer breakpoints (subgradient at them)
        dv = jnp.where(in_hi, 1.0, 0.0) - jnp.where(in_lo, 1.0, 0.0)
        return wv, dv

    base_y = jnp.arange(h, dtype=jnp.float32).reshape(1, h, 1)
    base_x = jnp.arange(w, dtype=jnp.float32).reshape(1, 1, w)
    vy, dvy = axis_w(base_y + flow_f[..., 0], h)
    vx, dvx = axis_w(base_x + flow_f[..., 1], w)
    v = (vy * vx)[..., None]

    dimg, dflow = _backward_fused(img, flow, r, gf * v)
    border_out = _forward(img, flow, r, "border").astype(jnp.float32)
    g_dot_out = jnp.sum(gf * border_out, axis=-1)  # [B, H, W]
    inside = (jnp.abs(flow.astype(jnp.float32)) < r).astype(jnp.float32)
    dv_flow = jnp.stack([dvy * vx, vy * dvx], axis=-1)
    dflow = dflow + g_dot_out[..., None] * dv_flow * inside
    return dimg.astype(img.dtype), dflow.astype(flow.dtype)


backward_warp_pallas.defvjp(_fwd, _bwd)


def backward_warp3d_bounded(
    img: jax.Array, flow: jax.Array, r_z: int = 8, r_yx: int = 16,
    padding: str = "border",
) -> jax.Array:
    """Deprecated alias — use ``ops.warp.backward_warp3d_slab(r_yx=...)``."""
    from opticalflowscivis_tpu.ops.warp import backward_warp3d_slab

    return backward_warp3d_slab(img, flow, r_z=r_z, padding=padding, r_yx=r_yx)
