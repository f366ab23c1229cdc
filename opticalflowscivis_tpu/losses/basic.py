"""Elementary loss functions — rank-generic, float32 accumulation."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opticalflowscivis_tpu.ops import backward_warp


def _f32(x: jax.Array) -> jax.Array:
    return x.astype(jnp.float32)


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(_f32(pred) - _f32(target)))


def charbonnier(x: jax.Array, alpha: float = 0.25, epsilon: float = 1e-9) -> jax.Array:
    """Generalized Charbonnier penalty (RIFE.py:190-191)."""
    return (_f32(x) ** 2 + epsilon**2) ** alpha


def epe(flow_pred: jax.Array, flow_gt: jax.Array, mean: bool = True) -> jax.Array:
    """End-point error: per-pixel L2 norm of the flow difference (loss.py:10-17)."""
    e = jnp.linalg.norm(_f32(flow_pred) - _f32(flow_gt), axis=-1)
    return jnp.mean(e) if mean else e


def sobel_loss(pred_flow: jax.Array, gt_flow: jax.Array) -> jax.Array:
    """L1 between Sobel edge maps of two 2-D flow fields (loss.py:58-81).

    The reference applies a fixed 3x3 Sobel-x/y pair per channel and compares the
    responses; used only in experiments, kept for capability parity.
    """
    kx = jnp.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], jnp.float32)
    ky = kx.T

    def edges(f):
        f = _f32(f)
        b, h, w, c = f.shape
        fc = jnp.moveaxis(f, -1, 1).reshape(b * c, h, w)[:, None]  # NCHW per-channel
        out = []
        for k in (kx, ky):
            out.append(
                jax.lax.conv_general_dilated(
                    fc, k[None, None], (1, 1), "SAME",
                    dimension_numbers=("NCHW", "OIHW", "NCHW"),
                )
            )
        return jnp.concatenate(out, axis=1)

    return jnp.mean(jnp.abs(edges(pred_flow) - edges(gt_flow)))


def photometric_loss(
    merged: jax.Array,
    flow: jax.Array,
    img0: jax.Array,
    img1: jax.Array,
    ndim: int,
    fast_warp_r: int = 0,
) -> jax.Array:
    """RIFE's photometric consistency term (RIFE.py:264-281).

    Warps the prediction by each flow half and penalizes the charbonnier
    difference against the opposite input frame.  The reference normalizes the
    channel sum by 3 and the batch sum by B regardless of actual channel count
    (RIFE.py:268-270); we keep that exact normalization for loss-scale parity.
    (The reference's inline ``backwrd_warp`` also carries a half-pixel grid
    offset from align_corners-mismatched normalization, RIFE.py:255-258 — a bug
    we do not replicate; lambda_photo=1e-5 makes the difference negligible.)

    ``fast_warp_r > 0`` routes the two full-resolution warps through the MXU
    one-hot Pallas kernel on TPU (exact for |flow| <= r, clamped beyond — the
    same bound the model's own warps already accept).  Measured round 5: the
    jnp gather warps here were the top ops of the b64 128^2 train step
    (~100 ms of 184 ms device time, Results/trace_summary.json).
    """
    per_image_denom = merged.shape[0] * 3  # reference divides channel-sum by 3

    use_fast = fast_warp_r > 0 and ndim == 2 and jax.default_backend() == "tpu"
    if use_fast:
        from opticalflowscivis_tpu.ops.pallas.warp import (
            backward_warp_pallas,
            warp2d_pallas_supported,
        )

        use_fast = warp2d_pallas_supported(merged.shape, fast_warp_r)

    def one_side(f, target):
        if use_fast:
            warped = backward_warp_pallas(merged, f, fast_warp_r, "zeros")
        else:
            warped = backward_warp(merged, f, padding="zeros")
        p = charbonnier(warped - target)
        return jnp.sum(p) / per_image_denom

    loss = one_side(flow[..., ndim:], img0) + one_side(flow[..., :ndim], img1)
    return loss / 2.0


def smoothness_loss(flow: jax.Array) -> jax.Array:
    """First-order charbonnier smoothness of a flow field (RIFE.py:196-218).

    Disabled (lambda=0) in the reference's final recipe but part of the menu.
    Matches the reference's zero-padded forward differences and
    sum-over-pixels / mean-over-channels / divide-by-batch normalization.
    """
    f = _f32(flow)
    total = 0.0
    for axis in range(1, f.ndim - 1):
        d = jnp.diff(f, axis=axis)
        pad = [(0, 0)] * f.ndim
        pad[axis] = (0, 1)
        total = total + charbonnier(jnp.pad(d, pad))
    return jnp.sum(jnp.mean(total / 2.0, axis=-1)) / f.shape[0]


def flow_supervision(
    flow_list: list[jax.Array],
    flow_teacher: jax.Array | None,
    gt_flow: jax.Array,
    ndim: int,
) -> jax.Array:
    """Supervised flow loss vs synthetic GT (RIFE.py:131-141).

    The GT flow is the per-step velocity of the middle frame; under backward
    warping F_t→1 = +v and F_t→0 = -v.  L1 over all student blocks (both
    directions) plus the teacher, averaged over the 8 terms.
    """
    gt = _f32(gt_flow)
    loss = 0.0
    n_terms = 0
    for f in flow_list:
        loss = loss + l1_loss(f[..., ndim:], gt) + l1_loss(f[..., :ndim], -gt)
        n_terms += 2
    if flow_teacher is not None:
        loss = loss + l1_loss(flow_teacher[..., ndim:], gt)
        loss = loss + l1_loss(flow_teacher[..., :ndim], -gt)
        n_terms += 2
    return loss / n_terms
