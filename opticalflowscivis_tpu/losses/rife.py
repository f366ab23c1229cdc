"""RIFE training loss composition — parity with Flow-2D/model/RIFE.py:80-301.

The reference's ``Model.update`` mixes seven weighted terms; the lambdas below
are its hard-coded values (RIFE.py:283-289).  Flow-3D differences
(Flow-3D/model/RIFE.py:132-134, 237-242): plain L1 instead of LapLoss (their 3-D
Laplacian was broken) and lambdas distill=0.1, reg=photo=0 — expressed here as a
different ``RIFELossWeights`` preset, not a code fork.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from opticalflowscivis_tpu.losses.basic import (
    flow_supervision,
    l1_loss,
    photometric_loss,
    smoothness_loss,
)
from opticalflowscivis_tpu.ops import lap_loss


@dataclasses.dataclass(frozen=True)
class RIFELossWeights:
    """Loss lambdas (RIFE.py:283-289; 3-D preset: Flow-3D/model/RIFE.py:237-242)."""

    l1: float = 1.0
    tea: float = 1.0
    distill: float = 0.01
    reg: float = 1e-6
    photo: float = 1e-5
    smooth: float = 0.0
    flow: float = 0.0
    use_lap: bool = True  # LapLoss for reconstruction; False -> plain L1 (3-D)
    # Framework-specific stabilizer (no reference equivalent): the bounded TPU
    # warps (fast_warp_r / bounded_warp_rz) have zero gradient for |flow| > r,
    # so flows that drift past the radius freeze every warp and collapse
    # training.  The leash penalizes the excess with a live gradient, pulling
    # escaped flows back inside the kernels' exact region.
    flow_leash: float = 0.0  # weight; 0 = off
    flow_leash_radius: float = 0.0  # radius r (match the warp radius)

    @staticmethod
    def preset_2d(flow_supervised: bool = False) -> "RIFELossWeights":
        # lambda_flow=0.5 was "best on rectangle" for supervised runs (RIFE.py:289)
        return RIFELossWeights(flow=0.5 if flow_supervised else 0.0)

    @staticmethod
    def preset_3d(distill: float = 0.0) -> "RIFELossWeights":
        """Flow-3D lambdas (Flow-3D/model/RIFE.py:237-242) — except distill.

        Deviation (measured, documented): the reference sets distill=0.1, but
        in this framework that weight collapses 3-D training — val loss rises
        from epoch ~2 and freezes (rectangle3d: 18→14 dB interp PSNR); with
        distill off the same run converges monotonically.  Pass distill=0.1
        explicitly to reproduce the reference recipe.
        """
        return RIFELossWeights(distill=distill, reg=0.0, photo=0.0,
                               use_lap=False)


def _block_param_l1(params: Any) -> jax.Array:
    """L1 norm of block2 + block_tea weights (RIFE.py:177-188)."""
    total = jnp.zeros((), jnp.float32)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = "/".join(str(getattr(p, "key", p)) for p in path)
        if "block2" in keys or "block_tea" in keys:
            total = total + jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
    return total


def rife_losses(
    outputs: dict,
    img0: jax.Array,
    img1: jax.Array,
    gt: jax.Array,
    params: Any,
    weights: RIFELossWeights,
    ndim: int,
    gt_flow: jax.Array | None = None,
    fast_warp_r: int = 0,
):
    """Compose the total RIFE training loss.

    Args:
      outputs: IFNet forward dict (flow_list/mask_list/merged/teacher/distill).
      img0, img1: input frames ``[B, *S, C]`` (density channel only).
      gt: ground-truth middle frame.
      params: model params pytree (for the block2/teacher L1 regularizer).
      weights: lambda configuration.
      ndim: spatial rank (2 or 3).
      gt_flow: optional synthetic GT flow ``[B, *S, ndim]`` (per-step velocity,
        row-major axes) enabling the supervised term.

    Returns:
      (loss_G, dict of weighted components) — the dict mirrors the 7-tuple the
      reference appends to loss.json (Flow-2D/train.py:516-544).
    """
    merged = outputs["merged"]
    flow_list = outputs["flow_list"]
    flow_teacher = outputs["flow_teacher"]
    merged_teacher = outputs["merged_teacher"]

    recon = lap_loss if weights.use_lap else l1_loss
    loss_l1 = recon(merged[-1], gt)
    loss_tea = (
        recon(merged_teacher, gt)
        if merged_teacher is not None
        else jnp.zeros((), jnp.float32)
    )

    loss_distill = outputs["loss_distill"].astype(jnp.float32)
    # NaN/overflow guard (RIFE.py:295-296): zero out bad distill values.
    loss_distill = jnp.where(
        jnp.isnan(loss_distill) | (loss_distill > 10.0), 0.0, loss_distill
    )

    l1_reg = _block_param_l1(params) if weights.reg else jnp.zeros((), jnp.float32)

    loss_photo = (
        photometric_loss(merged[-1], flow_list[-1], img0, img1, ndim,
                         fast_warp_r=fast_warp_r)
        if weights.photo
        else jnp.zeros((), jnp.float32)
    )
    loss_smooth = (
        smoothness_loss(flow_list[-1]) if weights.smooth else jnp.zeros((), jnp.float32)
    )
    loss_flow = (
        flow_supervision(flow_list, flow_teacher, gt_flow, ndim)
        if (weights.flow and gt_flow is not None)
        else jnp.zeros((), jnp.float32)
    )

    loss_leash = jnp.zeros((), jnp.float32)
    if weights.flow_leash and weights.flow_leash_radius:
        r = weights.flow_leash_radius
        for f in list(flow_list) + (
            [flow_teacher] if flow_teacher is not None else []
        ):
            excess = jax.nn.relu(jnp.abs(f.astype(jnp.float32)) - (r - 1.0))
            loss_leash = loss_leash + jnp.mean(excess**2)

    parts = {
        "loss_l1": loss_l1 * weights.l1,
        "loss_tea": loss_tea * weights.tea,
        "loss_distill": loss_distill * weights.distill,
        "l1_reg": l1_reg * weights.reg,
        "loss_photo": loss_photo * weights.photo,
        "loss_smooth": loss_smooth * weights.smooth,
        "loss_flow": loss_flow * weights.flow,
    }
    if weights.flow_leash and weights.flow_leash_radius:
        parts["loss_leash"] = loss_leash * weights.flow_leash
    loss_G = sum(parts.values())
    parts["loss_G"] = loss_G
    return loss_G, parts
