"""IFNet — RIFE-style student/teacher coarse-to-fine intermediate-flow network.

A single dimension-generic implementation replacing the reference's hand-forked
pair (``Flow-2D/model/IFNet.py`` and ``Flow-3D/model/IFNet.py``):

- ``IFBlock`` ⇔ IFNet.py:34-122 (version=2): two stride-2 convs, four residual
  double-conv blocks, two transposed-conv heads emitting ``2*ndim`` flow channels
  (F_t→0 and F_t→1) and 1 mask channel; inputs/flow are bilinearly downscaled by
  ``scale`` before and the outputs upscaled (flow values rescaled) after
  (IFNet.py:88-117).
- ``IFNet`` ⇔ IFNet.py:124-276: three student blocks at scales (4, 2, 1) with
  channels (128, 96, 64) in 2-D / (128, 64, 64) in 3-D (Flow-3D/model/IFNet.py:
  125-128), iterative residual flow refinement with backward warping of both
  inputs each round, a teacher block that additionally sees the ground-truth
  middle frame (scale 1), mask-blended merging, and the masked-RMSE distillation
  loss (IFNet.py:239-248).
- Timestep conditioning (the IFNet_m "arbitrary timestep" variant,
  Flow-2D/model/IFNet_m.py:63-82) is a config flag: a constant ``timestep``
  channel is appended to every block input.
- Optional Contextnet/Unet refinement ⇔ Flow-2D/model/refine.py (off by default,
  IFNet.py:32) lives in ``models/refine.py``.

TPU-first deviations from the reference (behaviour-preserving):
- channels-last layout, static shapes (inputs pre-padded to /32 — no per-step
  "correct shapes" cropping, which only existed to patch odd-size drift).
- the flow tensor is ``[..., 2*ndim]`` with ``flow[..., :ndim]`` = F_t→0 and
  ``flow[..., ndim:]`` = F_t→1, each ordered row-major (dy, dx) / (dz, dy, dx)
  to match ``ops.backward_warp``.
- compute dtype configurable (bfloat16 for MXU); losses accumulate in float32.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from opticalflowscivis_tpu.models.layers import ConvPReLU, DeconvPReLU, PReLU, ResConvBlock
from opticalflowscivis_tpu.ops import backward_warp, resize_flow, resize_spatial
from opticalflowscivis_tpu.ops.warp import backward_warp3d_slab


class IFBlock(nn.Module):
    """One coarse-to-fine refinement block (IFNet.py:34-122, version=2)."""

    ndim: int = 2
    c: int = 64
    conv0_kernel: int = 3  # reference uses 3 in 2-D, 4 in 3-D (Flow-3D IFNet.py:35-38)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, flow: jax.Array | None, scale: int):
        nd, c = self.ndim, self.c
        full_spatial = x.shape[1:-1]
        if scale != 1:
            small = tuple(s // scale for s in full_spatial)
            x = resize_spatial(x, small)
            if flow is not None:
                flow = resize_flow(flow, small)  # values rescale by 1/scale
        if flow is not None:
            x = jnp.concatenate([x, flow.astype(x.dtype)], axis=-1)

        x = ConvPReLU(c // 2, nd, kernel_size=self.conv0_kernel, stride=2, dtype=self.dtype)(x)
        x = ConvPReLU(c, nd, kernel_size=self.conv0_kernel, stride=2, dtype=self.dtype)(x)
        for _ in range(4):
            x = ResConvBlock(c, nd, dtype=self.dtype)(x)

        # flow head: deconv(c -> c/2) + deconv(c/2 -> 2*ndim)
        f = DeconvPReLU(c // 2, nd, dtype=self.dtype)(x)
        f = nn.ConvTranspose(2 * nd, kernel_size=(4,) * nd, strides=(2,) * nd,
                             padding="SAME", dtype=self.dtype)(f)
        # mask head: deconv(c -> c/2) + deconv(c/2 -> 1)
        m = DeconvPReLU(c // 2, nd, dtype=self.dtype)(x)
        m = nn.ConvTranspose(1, kernel_size=(4,) * nd, strides=(2,) * nd,
                             padding="SAME", dtype=self.dtype)(m)

        if scale != 1:
            f = resize_flow(f, full_spatial)  # values rescale by `scale`
            m = resize_spatial(m, full_spatial)
        return f, m


class IFNet(nn.Module):
    """Student/teacher coarse-to-fine interpolation flow network.

    Call with ``img0, img1`` of shape ``[B, *spatial, C]`` (C=1 for SciVis
    fields, 3 for RGB); ``gt`` (the real middle frame) enables the teacher
    branch and distillation loss during training.
    """

    ndim: int = 2
    in_channels: int = 1
    block_channels: Sequence[int] = (128, 96, 64)
    scales: Sequence[int] = (4, 2, 1)
    teacher_channels: int = 64
    teacher_scale: int = 1  # reference runs the teacher at scale 1
    # (IFNet.py:232); >1 is the single-chip 256^3 mode where no conv may
    # consume a full-resolution input (flow/mask are upscaled exactly like a
    # student block's)
    arbitrary_timestep: bool = False  # IFNet_m variant: timestep as input channel
    conv0_kernel: int = 3
    refine: bool = False  # Contextnet/Unet residual refinement (IFNet.py:255-274)
    fast_warp_r: int = 0  # >0 on TPU: MXU one-hot 2-D warp, exact for |flow| <= r
    bounded_warp_rz: int = 0  # >0: 3-D slab warp, exact for |flow_z| <= r_z
    # (HBM-random gathers cost ~1.2 s per 256^3 warp; the slab decomposition is
    # ~100x faster and SciVis per-step velocities are <= 8, create_data_3d.py:56)
    remat: bool = False  # rematerialize IFBlocks (trade FLOPs for HBM at 256^3)
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        img0: jax.Array,
        img1: jax.Array,
        gt: jax.Array | None = None,
        timestep: float | jax.Array = 0.5,
    ):
        nd = self.ndim
        n_blocks = len(self.block_channels)
        compute = img0.dtype if self.dtype is None else self.dtype
        img0 = img0.astype(compute)
        img1 = img1.astype(compute)

        def ts_channel(ref):
            t = jnp.asarray(timestep, compute)
            return jnp.broadcast_to(t, ref.shape[:-1] + (1,))

        # static_argnums=(3,): flax remat's core_fn args are (module, x, flow, scale)
        block_cls = nn.remat(IFBlock, static_argnums=(3,)) if self.remat else IFBlock
        blocks = [
            block_cls(nd, c, conv0_kernel=self.conv0_kernel, dtype=self.dtype,
                      name=f"block{i}")
            for i, c in enumerate(self.block_channels)
        ]

        if nd == 3 and self.bounded_warp_rz > 0:
            def warp(im, fl):
                return backward_warp3d_slab(
                    im, fl, r_z=self.bounded_warp_rz,
                    r_yx=self.fast_warp_r or self.bounded_warp_rz,
                    remat_taps=self.remat,
                )
        elif nd == 2 and self.fast_warp_r > 0 and jax.default_backend() == "tpu":
            from opticalflowscivis_tpu.ops.pallas.warp import (
                backward_warp_pallas,
                warp2d_pallas_supported,
            )

            def warp(im, fl):
                if warp2d_pallas_supported(im.shape, self.fast_warp_r):
                    return backward_warp_pallas(im, fl, self.fast_warp_r, "border")
                return backward_warp(im, fl)
        else:
            warp = backward_warp

        flow = None
        mask = None
        warped0, warped1 = img0, img1
        flow_list, mask_list, merged = [], [], []
        for i in range(n_blocks):
            if flow is None:
                inp = [img0, img1]
            else:
                inp = [img0, img1, warped0, warped1, mask]
            if self.arbitrary_timestep:
                inp.append(ts_channel(img0))
            # scale passed positionally: nn.remat static_argnums only covers
            # positional args
            flow_d, mask_d = blocks[i](jnp.concatenate(inp, axis=-1), flow,
                                       self.scales[i])
            flow = flow_d if flow is None else flow + flow_d
            mask = mask_d if mask is None else mask + mask_d
            flow_list.append(flow)
            mask_list.append(jax.nn.sigmoid(mask))
            warped0 = warp(img0, flow[..., :nd])  # F_t→0 samples img0
            warped1 = warp(img1, flow[..., nd:])  # F_t→1 samples img1
            merged.append((warped0, warped1))

        flow_teacher = None
        merged_teacher = None
        loss_distill = jnp.zeros((), jnp.float32)
        if gt is not None:
            gt = gt.astype(compute)
            tea_inp = [img0, img1, warped0, warped1, mask, gt]
            if self.arbitrary_timestep:
                tea_inp.append(ts_channel(img0))
            # scale passed positionally (nn.remat static_argnums covers
            # positional args only)
            flow_d, mask_d = block_cls(
                nd, self.teacher_channels, conv0_kernel=self.conv0_kernel,
                dtype=self.dtype, name="block_tea",
            )(jnp.concatenate(tea_inp, axis=-1), flow, self.teacher_scale)
            flow_teacher = flow + flow_d
            w0_tea = warp(img0, flow_teacher[..., :nd])
            w1_tea = warp(img1, flow_teacher[..., nd:])
            mask_teacher = jax.nn.sigmoid(mask + mask_d)
            merged_teacher = w0_tea * mask_teacher + w1_tea * (1 - mask_teacher)

        merged_out = []
        for i in range(n_blocks):
            m = merged[i][0] * mask_list[i] + merged[i][1] * (1 - mask_list[i])
            merged_out.append(m)
            if gt is not None:
                # Per-block distillation (IFNet.py:239-248): pull student flow
                # toward the teacher wherever the student's reconstruction is
                # worse than the teacher's by >0.01 (masked RMSE, all blocks).
                err_stu = jnp.mean(jnp.abs(m - gt), axis=-1, keepdims=True)
                err_tea = jnp.mean(
                    jnp.abs(merged_teacher - gt), axis=-1, keepdims=True
                )
                worse = jax.lax.stop_gradient(
                    (err_stu > err_tea + 0.01).astype(jnp.float32)
                )
                # eps inside the sqrt: where student == teacher flow the
                # bare sqrt has an infinite gradient (0*inf → NaN params)
                rmse = jnp.sqrt(
                    jnp.mean(
                        (
                            jax.lax.stop_gradient(flow_teacher) - flow_list[i]
                        ).astype(jnp.float32)
                        ** 2,
                        axis=-1,
                        keepdims=True,
                    )
                    + 1e-12
                )
                loss_distill = loss_distill + jnp.mean(rmse * worse)

        if self.refine:
            # Contextnet/Unet residual fusion on the final prediction
            # (IFNet.py:255-274; res = sigmoid*2-1, clamped add)
            from opticalflowscivis_tpu.models.refine import Contextnet, Unet

            ctx = Contextnet(nd, dtype=self.dtype, name="contextnet")
            c0 = ctx(img0, flow[..., :nd])
            c1 = ctx(img1, flow[..., nd:])
            res = Unet(nd, out_channels=img0.shape[-1], dtype=self.dtype,
                       name="unet")(img0, img1, warped0, warped1, mask, flow,
                                    c0, c1)
            merged_out[-1] = jnp.clip(merged_out[-1] + (res * 2 - 1), 0, 1)

        return {
            "flow_list": flow_list,
            "mask_list": mask_list,
            "merged": merged_out,
            "flow_teacher": flow_teacher,
            "merged_teacher": merged_teacher,
            "loss_distill": loss_distill,
        }


def ifnet_2d(in_channels: int = 1, dtype: Any = None, **kw) -> IFNet:
    """Reference Flow-2D configuration (IFNet.py:124-138).

    Defaults to the MXU one-hot warp on TPU (r=16, ~4x device time vs the
    gather warp; exact for |flow| <= 16); pass ``fast_warp_r=0`` for the
    unbounded gather path.
    """
    kw.setdefault("fast_warp_r", 16)
    return IFNet(ndim=2, in_channels=in_channels,
                 block_channels=(128, 96, 64), teacher_channels=64,
                 conv0_kernel=3, dtype=dtype, **kw)


def ifnet_3d(in_channels: int = 1, dtype: Any = None, **kw) -> IFNet:
    """Reference Flow-3D configuration (Flow-3D/model/IFNet.py:125-128).

    Defaults to the bounded slab warp (r_z=10) — the gather warp costs ~1.2 s
    per 256^3 volume on TPU; pass ``bounded_warp_rz=0`` for the exact
    unbounded-gather path.
    """
    kw.setdefault("bounded_warp_rz", 8)  # data velocities <= 8 (create_data_3d.py:56)
    kw.setdefault("fast_warp_r", 8)  # in-plane bound; smaller r = bigger tiles
    return IFNet(ndim=3, in_channels=in_channels,
                 block_channels=(128, 64, 64), teacher_channels=64,
                 conv0_kernel=4, dtype=dtype, **kw)
