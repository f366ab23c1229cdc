"""Fused backward-warp kernel (Pallas / TPU) — gather-free bilinear sampling.

Why: XLA lowers warp gathers to per-element random access that measures at
~47 ms for one 32x160x224 warp on v5e (materialized timing — the relay executes
lazily, so naive timings lie), making warping dominate both RIFE pipelines.
The TPU has no vector gather — the fast path converts random access into
arithmetic.  This kernel does exact bilinear sampling as a **one-hot matmul**
on the MXU:

  For an output row-chunk, source rows live in a bounded window (displacement
  clamped to ±R).  A[p, q] = w_lo(p)·1[q = iy0(p)] + w_hi(p)·1[q = iy0(p)+1]
  (built via iota comparisons — VPU), then rows = A @ window (MXU) interpolates
  along y for every window column; a second one-hot mask contracted elementwise
  interpolates along x.

Mosaic constraints shaped the implementation:
- no lane-crossing reshapes inside kernels → the per-pixel coordinates
  (iy0, ay, ix0, ax) are computed and flattened to [P, 1] by XLA outside;
  every in-kernel tensor stays 2-D;
- halo windows are produced as XLA slices feeding full-block pallas_calls;
- multi-channel windows are flattened to [THwin, Wwin*C] and the x one-hot is
  built channel-repeated via an iota floor-div, avoiding lane-splitting.

Exactness domain: |flow| <= R (default 16) — beyond that the displacement
clamps (the jnp gather path in ``ops.warp`` stays the general reference and
CPU path).  SciVis flows are <= 8 px/step (create_rectangle_2d.py:120-127).

Backward: custom_vjp; bwd uses the exact jnp formulation for now.
"""

from __future__ import annotations

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
        p8 = _round_up(p, 8)
        a = p8 * _round_up(thwin, 128) * 4
        win = _round_up(thwin, 8) * _round_up(wwin * c, 128) * 4
        rows = p8 * _round_up(wwin * c, 128) * 4
        xmask = p8 * _round_up(wwin * c, 128) * 4
        outb = p8 * 128 * 4
        coeff = p8 * 128 * 4
        if (a + win + rows + xmask + outb + coeff) * 2 < _VMEM_BUDGET:
            return th
    return None


def warp2d_pallas_supported(img_shape: tuple, r: int = 16) -> bool:
    if len(img_shape) != 4:
        return False
    _, h, w, c = img_shape
    return _pick_tile(h, w, c, r) is not None


def _warp_kernel(thwin: int, wwin: int, c: int, win_ref, coef_ref, out_ref):
    """win [1,1,THwin,Wwin*C]; coef [1,1,P,4] = (iy0, ay, ix0, ax) window
    coords; out [1,1,P,C].  Effectively 2-D per block — no lane-crossing
    reshapes; one MXU matmul + one masked lane reduction."""
    p = coef_ref.shape[2]
    coef = coef_ref[0, 0]
    iy0 = coef[:, 0:1]
    ay = coef[:, 1:2]
    ix0 = coef[:, 2:3]
    ax = coef[:, 3:4]

    q = jax.lax.broadcasted_iota(jnp.int32, (p, thwin), 1).astype(jnp.float32)
    a_mat = jnp.where(q == iy0, 1.0 - ay, 0.0) + jnp.where(q == iy0 + 1.0, ay, 0.0)

    win = win_ref[0, 0].astype(jnp.float32)
    rows = jnp.dot(a_mat, win, preferred_element_type=jnp.float32)  # [P, Wwin*C]

    # x one-hot, channel-repeated: column index of lane l is l // C
    col = (jax.lax.broadcasted_iota(jnp.int32, (p, wwin * c), 1) // c).astype(
        jnp.float32
    )
    x_mat = jnp.where(col == ix0, 1.0 - ax, 0.0) + jnp.where(col == ix0 + 1.0, ax, 0.0)

    prod = rows * x_mat  # [P, Wwin*C]
    if c == 1:
        out_ref[0, 0, :, 0] = jnp.sum(prod, axis=1)
    else:
        # channel split without lane reshape: mask per channel and reduce
        ch = jax.lax.broadcasted_iota(jnp.int32, (p, wwin * c), 1) % c
        for k in range(c):
            out_ref[0, 0, :, k] = jnp.sum(jnp.where(ch == k, prod, 0.0), axis=1)


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

    img_pad = jnp.pad(
        img, [(0, 0), (margin, margin), (margin, margin), (0, 0)], mode="edge"
    )

    # XLA-side prep: window coords flattened to [B, n_chunks, P, 4] and the
    # (overlapping) row windows [B, n_chunks, THwin, Wwin*C] — both consumed
    # blockwise by a (B, n_chunks) kernel grid.
    flow_f = jnp.clip(flow.astype(jnp.float32), -r, r)
    row_local = jax.lax.broadcasted_iota(jnp.float32, (1, n_chunks, th, w), 2)
    col_local = jax.lax.broadcasted_iota(jnp.float32, (1, n_chunks, th, w), 3)
    fl = flow_f.reshape(b, n_chunks, th, w, 2)
    wy = row_local + margin + fl[..., 0]
    wx = col_local + margin + fl[..., 1]
    iy0 = jnp.floor(wy)
    ix0 = jnp.floor(wx)
    coefs = jnp.stack([iy0, wy - iy0, ix0, wx - ix0], axis=-1).reshape(
        b, n_chunks, p, 4
    )
    windows = jnp.stack(
        [
            jax.lax.slice_in_dim(img_pad, j * th, j * th + thwin, axis=1)
            for j in range(n_chunks)
        ],
        axis=1,
    ).reshape(b, n_chunks, thwin, wwin * c)

    out = pl.pallas_call(
        partial(_warp_kernel, thwin, wwin, c),
        out_shape=jax.ShapeDtypeStruct((b, n_chunks, p, c), jnp.float32),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, thwin, wwin * c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p, 4), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, p, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_chunks * p * thwin * wwin * c,
            bytes_accessed=b * n_chunks * (thwin * wwin * c + p * (4 + c)) * 4,
            transcendentals=0,
        ),
    )(windows, coefs)
    out = out.reshape(b, h, w, c)

    if padding == "zeros":
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


def _bwd_kernel(thwin: int, wwin: int, c: int, win_ref, coef_ref, g_ref,
                dwin_ref, dcoef_ref):
    """Fused backward: dwin = Aᵀ @ (G⊙X); dwy/dwx via derivative one-hots.

    win [1,1,THwin,Wwin*C]; coef [1,1,P,4]; g [1,1,P,C] →
    dwin [1,1,THwin,Wwin*C]; dcoef [1,1,P,2] = (dwy, dwx).
    """
    p = coef_ref.shape[2]
    coef = coef_ref[0, 0]
    iy0, ay = coef[:, 0:1], coef[:, 1:2]
    ix0, ax = coef[:, 2:3], coef[:, 3:4]
    g = g_ref[0, 0].astype(jnp.float32)  # [P, C]
    win = win_ref[0, 0].astype(jnp.float32)  # [THwin, Wwin*C]

    q = jax.lax.broadcasted_iota(jnp.int32, (p, thwin), 1).astype(jnp.float32)
    oh_y_lo = jnp.where(q == iy0, 1.0, 0.0)
    oh_y_hi = jnp.where(q == iy0 + 1.0, 1.0, 0.0)
    a_mat = oh_y_lo * (1.0 - ay) + oh_y_hi * ay

    lane = jax.lax.broadcasted_iota(jnp.int32, (p, wwin * c), 1)
    col = (lane // c).astype(jnp.float32)
    oh_x_lo = jnp.where(col == ix0, 1.0, 0.0)
    oh_x_hi = jnp.where(col == ix0 + 1.0, 1.0, 0.0)
    x_mat = oh_x_lo * (1.0 - ax) + oh_x_hi * ax

    if c == 1:
        g_cols = g[:, 0:1]  # broadcast over lanes
        gx = x_mat * g_cols
    else:
        ch = lane % c
        gx = jnp.zeros((p, wwin * c), jnp.float32)
        for k in range(c):
            gx = gx + jnp.where(ch == k, x_mat * g[:, k : k + 1], 0.0)

    # dwin = Aᵀ @ GX  (contract P)
    dwin_ref[0, 0] = jax.lax.dot_general(
        a_mat, gx, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # dA = GX @ winᵀ (contract window columns) → dwy via (hi − lo) one-hots
    d_a = jax.lax.dot_general(
        gx, win, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [P, THwin]
    dcoef_ref[0, 0, :, 0] = jnp.sum(d_a * (oh_y_hi - oh_y_lo), axis=1)

    # rows = A @ win; dX = rows ⊙ G_cols → dwx via x (hi − lo) one-hots
    rows = jnp.dot(a_mat, win, preferred_element_type=jnp.float32)
    if c == 1:
        rows_g = rows * g[:, 0:1]
    else:
        ch = lane % c
        rows_g = jnp.zeros((p, wwin * c), jnp.float32)
        for k in range(c):
            rows_g = rows_g + jnp.where(ch == k, rows * g[:, k : k + 1], 0.0)
    dcoef_ref[0, 0, :, 1] = jnp.sum(rows_g * (oh_x_hi - oh_x_lo), axis=1)


def _backward_fused(img, flow, r, g):
    """Border-mode fused backward pass (same tiling as the forward)."""
    b, h, w, c = img.shape
    th = _pick_tile(h, w, c, r)
    margin = r + 1
    thwin = th + 2 * margin
    wwin = w + 2 * margin
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
    coefs = jnp.stack([iy0, wy - iy0, ix0, wx - ix0], axis=-1).reshape(
        b, n_chunks, p, 4
    )
    windows = jnp.stack(
        [
            jax.lax.slice_in_dim(img_pad, j * th, j * th + thwin, axis=1)
            for j in range(n_chunks)
        ],
        axis=1,
    ).reshape(b, n_chunks, thwin, wwin * c)
    g4 = g.astype(jnp.float32).reshape(b, n_chunks, p, c)

    dwin, dcoef = pl.pallas_call(
        partial(_bwd_kernel, thwin, wwin, c),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_chunks, thwin, wwin * c), jnp.float32),
            jax.ShapeDtypeStruct((b, n_chunks, p, 2), jnp.float32),
        ),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, thwin, wwin * c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p, 4), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, thwin, wwin * c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p, 2), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(windows, coefs, g4)

    # overlap-add the window grads back into the padded image, then fold the
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
    # pad-adjoint: rows/cols in the margins flow to the nearest edge pixel
    top = jnp.sum(dimg_pad[:, : margin + 1], axis=1, keepdims=True)
    bot = jnp.sum(dimg_pad[:, -(margin + 1) :], axis=1, keepdims=True)
    mid = dimg_pad[:, margin + 1 : -(margin + 1)]
    dimg_rows = jnp.concatenate([top, mid, bot], axis=1)
    left = jnp.sum(dimg_rows[:, :, : margin + 1], axis=2, keepdims=True)
    right = jnp.sum(dimg_rows[:, :, -(margin + 1) :], axis=2, keepdims=True)
    dimg = jnp.concatenate(
        [left, dimg_rows[:, :, margin + 1 : -(margin + 1)], right], axis=2
    )

    dcoef = dcoef.reshape(b, n_chunks, th, w, 2).reshape(b, h, w, 2)
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

    # zeros mode: fall back to the exact jnp formulation
    from opticalflowscivis_tpu.ops.warp import backward_warp

    flow_c = jnp.clip(flow, -r, r)

    def f(im, fl):
        return backward_warp(im, fl, padding=padding)

    out_example, vjp = jax.vjp(f, img, flow_c)
    dimg, dflow = vjp(g.astype(out_example.dtype))
    return dimg.astype(img.dtype), dflow.astype(flow.dtype)


backward_warp_pallas.defvjp(_fwd, _bwd)
