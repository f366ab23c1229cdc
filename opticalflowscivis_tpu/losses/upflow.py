"""UPFlow unsupervised loss composition.

Parity with ``UPFlow_net.forward``'s loss block (upflow.py:461-573) and
``network_tools`` loss helpers (upflow.py:140-289) / ``utils/loss.py``:

- occlusion masks from the forward-backward check (ops.occ_check ⇔
  tools.occ_check_model, tools.py:543-719);
- photometric loss (abs_robust / charbonnier / L1 / weighted-SSIM,
  upflow.py:267-289), optionally occlusion-normalized;
- census loss (ops.census_loss ⇔ loss.py:51-91) weighted by
  ``photo_loss_census_weight``;
- edge-aware first/second-order smoothness (upflow.py:199-244) or plain delta
  smoothness (upflow.py:247-264), at full or 1/4 scale;
- multi-scale distillation of the final flow into the pyramid levels
  ('down' or 'upup' style, upflow.py:537-567).

Default weights follow ``Trainer.Config`` (simple_train.py:136-155) /
``UPFlow_net.config`` (upflow.py:293-330).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from opticalflowscivis_tpu.ops import backward_warp, census_loss, occ_check, upsample_flow_as
from opticalflowscivis_tpu.ops.resize import resize_like


@dataclasses.dataclass(frozen=True)
class UPFlowLossConfig:
    occ_alpha_1: float = 0.1
    occ_alpha_2: float = 0.5
    stop_occ_gradient: bool = False
    photo_loss_type: str = "abs_robust"  # abs_robust | charbonnier | L1 | SSIM
    photo_loss_delta: float = 0.4
    photo_loss_use_occ: bool = False
    photo_weight: float = 1.0
    census_weight: float = 0.0
    smooth_level: str = "final"  # final | 1/4
    smooth_type: str = "edge"  # edge | delta
    smooth_order_1_weight: float = 1.0
    smooth_order_2_weight: float = 0.0
    msd_weight: float = 0.0
    msd_style: str = "upup"  # down | upup
    msd_use_occ: bool = True


def photo_loss_multi_type(
    x: jax.Array,
    y: jax.Array,
    occ_mask: jax.Array,
    loss_type: str = "abs_robust",
    delta: float = 0.4,
    use_occ: bool = False,
) -> jax.Array:
    """upflow.py:267-289."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    if loss_type == "abs_robust":
        diff = (jnp.abs(x - y) + 0.01) ** delta
    elif loss_type == "charbonnier":
        diff = ((x - y) ** 2 + 1e-6) ** delta
    elif loss_type == "L1":
        diff = jnp.abs(x - y + 1e-6)
    elif loss_type == "SSIM":
        diff, occ_mask = weighted_ssim(x, y, occ_mask)
        use_occ = True
    else:
        raise ValueError(f"wrong photo_loss type: {loss_type}")
    if use_occ:
        return jnp.sum(diff * occ_mask) / (jnp.sum(occ_mask) + 1e-6)
    return jnp.mean(diff)


def weighted_ssim(x, y, weight, c1=float("inf"), c2=9e-6, weight_epsilon=0.01):
    """Occlusion-weighted SSIM loss map (upflow.py:141-196); 'valid' 3x3 pooling."""

    def pool(z):
        out = z
        for axis in (1, 2):
            length = out.shape[axis] - 2
            out = (
                jax.lax.slice_in_dim(out, 0, length, axis=axis)
                + jax.lax.slice_in_dim(out, 1, length + 1, axis=axis)
                + jax.lax.slice_in_dim(out, 2, length + 2, axis=axis)
            ) / 3.0
        return out

    avg_w = pool(weight)
    w_plus = weight + weight_epsilon
    inv_avg_w = 1.0 / (avg_w + weight_epsilon)

    def wpool(z):
        return pool(z * w_plus) * inv_avg_w

    mu_x, mu_y = wpool(x), wpool(y)
    sx = wpool(x * x) - mu_x**2
    sy = wpool(y * y) - mu_y**2
    sxy = wpool(x * y) - mu_x * mu_y
    if c1 == float("inf"):
        n, d = 2 * sxy + c2, sx + sy + c2
    elif c2 == float("inf"):
        n, d = 2 * mu_x * mu_y + c1, mu_x**2 + mu_y**2 + c1
    else:
        n = (2 * mu_x * mu_y + c1) * (2 * sxy + c2)
        d = (mu_x**2 + mu_y**2 + c1) * (sx + sy + c2)
    return jnp.clip((1 - n / d) / 2, 0, 1), avg_w


def edge_aware_smoothness(img: jax.Array, pred: jax.Array, order: int = 1) -> jax.Array:
    """upflow.py:199-244 — image-gradient-weighted flow gradients, per axis."""
    img = img.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    total = 0.0
    for axis in (1, 2):

        def grad(z, stride=1, ax=axis):
            n = z.shape[ax] - stride
            return jax.lax.slice_in_dim(z, 0, n, axis=ax) - jax.lax.slice_in_dim(
                z, stride, n + stride, axis=ax
            )

        if order == 1:
            pg = grad(pred)
            ig = grad(img)
        else:
            pg = grad(grad(pred))
            ig = grad(img, stride=2)
        w = jnp.exp(-jnp.mean(jnp.abs(ig), axis=-1, keepdims=True))
        total = total + jnp.mean(jnp.abs(pg) * w)
    return total


def flow_smooth_delta(flow: jax.Array, second_order: bool = False) -> jax.Array:
    """upflow.py:247-264 — plain L1 of flow gradients."""
    f = flow.astype(jnp.float32)
    dy = f[:, 1:] - f[:, :-1]
    dx = f[:, :, 1:] - f[:, :, :-1]
    loss = jnp.mean(jnp.abs(dx)) + jnp.mean(jnp.abs(dy))
    if second_order:
        dx2 = dx[:, :, 1:] - dx[:, :, :-1]
        dxdy = dx[:, 1:] - dx[:, :-1]
        dydx = dy[:, :, 1:] - dy[:, :, :-1]
        dy2 = dy[:, 1:] - dy[:, :-1]
        for t in (dx2, dxdy, dydx, dy2):
            loss = loss + jnp.mean(jnp.abs(t))
    return loss


def upflow_losses(
    outputs: dict,
    im1: jax.Array,
    im2: jax.Array,
    cfg: UPFlowLossConfig,
    raw: tuple[jax.Array, jax.Array, jax.Array] | None = None,
):
    """(total, parts) from UPFlowNet outputs — upflow.py:461-573 composition.

    ``raw = (im1_raw, im2_raw, start)`` enables boundary-dilated warping
    (upflow.py:499-512 w/ if_use_boundary_warp): the photometric/census warps
    sample the *uncropped* images at the crop offset ``start [B, 2]``, so flow
    vectors pointing outside the training crop hit real pixels instead of
    border padding.  ``None`` keeps the border-padded warp (the zero-offset
    case — what the reference's executed path does, upflow.py:503-506 sets
    start=0 and im*_raw to the crop itself)."""
    flow_f, flow_b = outputs["flow_f"], outputs["flow_b"]
    flows = outputs["flows"]

    occ_fw, occ_bw = occ_check(flow_f, flow_b, cfg.occ_alpha_1, cfg.occ_alpha_2)
    if cfg.stop_occ_gradient:
        occ_fw = jax.lax.stop_gradient(occ_fw)
        occ_bw = jax.lax.stop_gradient(occ_bw)

    # --- smooth loss
    if cfg.smooth_level == "final":
        s_ff, s_fb, s_im1, s_im2 = flow_f, flow_b, im1, im2
    else:  # '1/4': finest decoded level
        s_ff, s_fb = flows[0]
        s_im1 = resize_like(im1, s_ff)
        s_im2 = resize_like(im2, s_fb)
    smooth = jnp.zeros((), jnp.float32)
    for w, order in ((cfg.smooth_order_1_weight, 1), (cfg.smooth_order_2_weight, 2)):
        if w > 0:
            if cfg.smooth_type == "edge":
                smooth = smooth + w * (
                    edge_aware_smoothness(s_im1, s_ff, order)
                    + edge_aware_smoothness(s_im2, s_fb, order)
                )
            else:
                smooth = smooth + w * (
                    flow_smooth_delta(s_ff, order == 2)
                    + flow_smooth_delta(s_fb, order == 2)
                )

    # --- photometric loss (full-frame boundary handling: border-padded warp is
    # the zero-crop-offset case of the reference's boundary_dilated_warp)
    if raw is not None:
        from opticalflowscivis_tpu.ops import boundary_dilated_warp

        im1_raw, im2_raw, start = raw
        im1_warp = boundary_dilated_warp(im2_raw, flow_f, start)
        im2_warp = boundary_dilated_warp(im1_raw, flow_b, start)
    else:
        im1_warp = backward_warp(im2, flow_f, padding="border")
        im2_warp = backward_warp(im1, flow_b, padding="border")
    photo = photo_loss_multi_type(
        im1, im1_warp, occ_fw, cfg.photo_loss_type, cfg.photo_loss_delta,
        cfg.photo_loss_use_occ,
    ) + photo_loss_multi_type(
        im2, im2_warp, occ_bw, cfg.photo_loss_type, cfg.photo_loss_delta,
        cfg.photo_loss_use_occ,
    )
    photo = photo * cfg.photo_weight

    # --- census loss
    census = jnp.zeros((), jnp.float32)
    if cfg.census_weight > 0:
        census = cfg.census_weight * (
            census_loss(im1, im1_warp, mask=occ_fw if cfg.photo_loss_use_occ else None,
                        robust=True)
            + census_loss(im2, im2_warp, mask=occ_bw if cfg.photo_loss_use_occ else None,
                          robust=True)
        )

    # --- multi-scale distillation
    msd = jnp.zeros((), jnp.float32)
    if cfg.msd_weight > 0:
        label_f = jax.lax.stop_gradient(flow_f)
        label_b = jax.lax.stop_gradient(flow_b)
        for scale_f, scale_b in flows:
            if cfg.msd_style == "down":
                lf = upsample_flow_as(label_f, scale_f)
                lb = upsample_flow_as(label_b, scale_b)
                of = resize_like(occ_fw, scale_f, method="nearest")
                ob = resize_like(occ_bw, scale_b, method="nearest")
                sf, sb = scale_f, scale_b
            else:  # 'upup'
                lf, lb = label_f, label_b
                sf = upsample_flow_as(scale_f, label_f)
                sb = upsample_flow_as(scale_b, label_b)
                of, ob = occ_fw, occ_bw
            msd = msd + photo_loss_multi_type(sf, lf, of, "abs_robust",
                                              use_occ=cfg.msd_use_occ)
            msd = msd + photo_loss_multi_type(sb, lb, ob, "abs_robust",
                                              use_occ=cfg.msd_use_occ)
        msd = msd * cfg.msd_weight

    parts = {
        "photo_loss": photo,
        "smooth_loss": smooth,
        "census_loss": census,
        "msd_loss": msd,
        "occ_fw_mean": jnp.mean(occ_fw),
    }
    total = photo + smooth + census + msd
    parts["loss_total"] = total
    return total, parts
