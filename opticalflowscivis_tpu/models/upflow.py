"""UPFlow — PWC-style unsupervised optical-flow network with cost volume.

Re-design of ``UPFlow/model/upflow.py`` (734 LoC) + ``pwc_modules.py``:

- ``FeatureExtractor`` ⇔ pwc_modules.py:122-142: 6 conv levels, channels
  (in, 16, 32, 64, 96, 128, 196), each stride-2 conv + stride-1 conv with
  LeakyReLU(0.1); coarsest-first pyramid.
- ``FlowEstimatorDense`` ⇔ FlowEstimatorDense_v2 (pwc_modules.py:250-286):
  densely-connected 5-conv stack, channels (128,128,96,64,32), linear 2-ch head;
  returns (dense features, flow residual).
- ``ContextNetwork`` ⇔ ContextNetwork_v2_ (pwc_modules.py:396-412): dilations
  (1,2,4,8,16,1) + linear head.
- ``SGUModel`` ⇔ network_tools.sgu_model (upflow.py:21-93): self-guided
  upsampling — a small dense estimator predicts an interpolation-flow and blend
  mask, the upsampled flow is warped by the interpolation flow and blended.
- ``UPFlowNet.forward`` ⇔ forward_2_frame_v3 + decode_level_res
  (upflow.py:580-665): bidirectional coarse-to-fine decoding over the top 5
  pyramid levels with shared estimator weights, per-level: x2 flow upsample
  (align_corners=True, magnitude-rescaled), feature warping (zeros padding x
  validity mask, WarpingLayer_no_div pwc_modules.py:179-207), optional UFlow
  feature normalization (upflow.py:96-138), 9x9 cost volume (the reference's
  external CUDA extension — here ``ops.cost_volume``; Pallas fast path in
  ops/pallas), LeakyReLU, dense estimator + dilated context refinement.

Flow convention: row-major (dy, dx) like the rest of the framework (the
reference uses torch (u=x, v=y) channel order).  Layout: channels-last.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from opticalflowscivis_tpu.ops import backward_warp, cost_volume, upsample_flow_as
from opticalflowscivis_tpu.ops.resize import resize_like


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class ConvLeaky(nn.Module):
    """3x3 conv + LeakyReLU(0.1), torch-padding dilation (pwc_modules.py:10-31)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    relu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # torch padding ((k-1)*d)//2 (pwc_modules.py:15): symmetric, unlike XLA
        # 'SAME' which pads (0, 1) at stride 2
        p = (self.dilation * (self.kernel_size - 1)) // 2
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,) * 2,
            strides=(self.stride,) * 2,
            kernel_dilation=(self.dilation,) * 2,
            padding=[(p, p)] * 2,
            dtype=self.dtype,
        )(x)
        return _leaky(x) if self.relu else x


class FeatureExtractor(nn.Module):
    num_chs: Sequence[int] = (3, 16, 32, 64, 96, 128, 196)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        pyramid = []
        for ch in self.num_chs[1:]:
            x = ConvLeaky(ch, stride=2, dtype=self.dtype)(x)
            x = ConvLeaky(ch, dtype=self.dtype)(x)
            pyramid.append(x)
        return pyramid[::-1]  # coarsest first


class FlowEstimatorDense(nn.Module):
    f_channels: Sequence[int] = (128, 128, 96, 64, 32)
    out_channels: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for f in self.f_channels:
            x = jnp.concatenate([ConvLeaky(f, dtype=self.dtype)(x), x], axis=-1)
        out = ConvLeaky(self.out_channels, relu=False, dtype=self.dtype)(x)
        return x, out


class ContextNetwork(nn.Module):
    f_channels: Sequence[int] = (128, 128, 128, 96, 64, 32, 2)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dilations = (1, 2, 4, 8, 16, 1)
        for f, d in zip(self.f_channels[:-1], dilations):
            x = ConvLeaky(f, dilation=d, dtype=self.dtype)(x)
        return ConvLeaky(self.f_channels[-1], relu=False, dtype=self.dtype)(x)


def warp_with_mask(feature: jax.Array, flow: jax.Array, fast_r: int = 0) -> jax.Array:
    """WarpingLayer_no_div: zeros-padded warp x warped-ones validity mask.

    ``fast_r > 0`` on TPU uses the MXU one-hot kernel (exact for |flow| <=
    fast_r) with the validity mask computed analytically — the warped-ones
    trick exists in the reference only because torch lacks the closed form.
    """
    if fast_r > 0 and jax.default_backend() == "tpu":
        from opticalflowscivis_tpu.ops.pallas.warp import (
            backward_warp_pallas,
            warp2d_pallas_supported,
        )

        if warp2d_pallas_supported(feature.shape, fast_r):
            warped = backward_warp_pallas(feature, flow, fast_r, "zeros")
            h, w = feature.shape[1:3]
            fy = jnp.clip(flow[..., 0].astype(jnp.float32), -fast_r, fast_r)
            fx = jnp.clip(flow[..., 1].astype(jnp.float32), -fast_r, fast_r)
            sy = jnp.arange(h, dtype=jnp.float32).reshape(1, h, 1) + fy
            sx = jnp.arange(w, dtype=jnp.float32).reshape(1, 1, w) + fx
            valid = (
                (sy >= 0) & (sy <= h - 1) & (sx >= 0) & (sx <= w - 1)
            ).astype(warped.dtype)
            return warped * valid[..., None]
    warped, mask = backward_warp(feature, flow, padding="zeros", return_mask=True)
    return warped * (mask > 0.9999).astype(warped.dtype)


def normalize_features(f1: jax.Array, f2: jax.Array, across_channels: bool = True,
                       across_images: bool = True):
    """UFlow-style feature normalization before the cost volume (upflow.py:96-138)."""
    axes = tuple(range(1, f1.ndim)) if across_channels else tuple(range(1, f1.ndim - 1))
    stats = []
    for f in (f1, f2):
        mean = jnp.mean(f, axis=axes, keepdims=True)
        var = jnp.var(f, axis=axes, keepdims=True)
        stats.append((mean, var))
    if across_images:
        mean = jnp.mean(jnp.stack([m for m, _ in stats]), axis=0)
        var = jnp.var(jnp.stack([v for _, v in stats]), axis=0)
        stats = [(mean, var), (mean, var)]
    out = []
    for f, (mean, var) in zip((f1, f2), stats):
        out.append((f - mean) / jnp.sqrt(var + 1e-16))
    return out[0], out[1]


class SGUModel(nn.Module):
    """Self-guided upsampling (upflow.py:21-93)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, flow_init, feature_1, feature_2, output_level_flow=None):
        if flow_init.shape[1:-1] != feature_1.shape[1:-1]:
            flow_init = upsample_flow_as(flow_init, feature_1)
        f2_warp = warp_with_mask(feature_2, flow_init)
        x = jnp.concatenate([feature_1, f2_warp], axis=-1)
        _, out = FlowEstimatorDense(
            f_channels=(32, 32, 32, 16, 8), out_channels=3, dtype=self.dtype,
            name="dense_estimator_mask",
        )(x)
        inter_flow = out[..., :2]
        inter_mask = jax.nn.sigmoid(out[..., 2:3])
        if output_level_flow is not None:
            inter_flow = upsample_flow_as(inter_flow, output_level_flow)
            inter_mask = resize_like(inter_mask, output_level_flow, align_corners=True)
            flow_init = output_level_flow
        flow_up = (
            backward_warp(flow_init, inter_flow, padding="border") * (1 - inter_mask)
            + flow_init * inter_mask
        )
        return flow_up

    # output_conv lives on UPFlowNet (shared between both directions)


class SGUOutputConv(nn.Module):
    """Full-resolution guidance features for SGU (upflow.py:68-71)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = ConvLeaky(16, dtype=self.dtype)(x)
        x = ConvLeaky(16, stride=2, dtype=self.dtype)(x)
        x = ConvLeaky(32, dtype=self.dtype)(x)
        x = ConvLeaky(32, stride=2, dtype=self.dtype)(x)
        return x


@dataclasses.dataclass(frozen=True)
class UPFlowConfig:
    """Architecture knobs ⇔ UPFlow_net.config (upflow.py:291-330)."""

    in_channels: int = 3
    num_chs: tuple[int, ...] = (3, 16, 32, 64, 96, 128, 196)
    search_range: int = 4
    estimator_f_channels: tuple[int, ...] = (128, 128, 96, 64, 32)
    context_f_channels: tuple[int, ...] = (128, 128, 128, 96, 64, 32, 2)
    output_level: int = 4  # decode the 5 coarsest levels (1/64 .. 1/4)
    if_norm_before_cost_volume: bool = False
    norm_moments_across_channels: bool = True
    norm_moments_across_images: bool = True
    if_sgu_upsample: bool = False
    batch_directions: bool = True  # run the fw/bw decode streams stacked
    #   along the batch axis through the shared-weight subnets (one
    #   extractor/estimator/context/corr call per level instead of two).
    #   Numerically identical (every op is per-sample: convs, per-image
    #   moments, cost volume) and parameter-tree identical (modules are
    #   explicitly named), but halves the op count — the UPFlow step at
    #   small grids is utilization-bound, not FLOP-bound (RESULTS.md round
    #   4), so fewer, 2x-larger ops is the available throughput lever.


class UPFlowNet(nn.Module):
    """Bidirectional pyramid flow network; returns full-res fw/bw flow + pyramid."""

    cfg: UPFlowConfig = UPFlowConfig()
    dtype: Any = None

    @nn.compact
    def __call__(self, im1: jax.Array, im2: jax.Array):
        cfg = self.cfg
        compute = im1.dtype if self.dtype is None else self.dtype
        im1 = im1.astype(compute)
        im2 = im2.astype(compute)

        extractor = FeatureExtractor(cfg.num_chs, dtype=self.dtype)
        if cfg.batch_directions:  # one pyramid pass over [im1; im2]
            p_all = extractor(jnp.concatenate([im1, im2], axis=0))
            nb = im1.shape[0]
            p1 = [f[:nb] for f in p_all]
            p2 = [f[nb:] for f in p_all]
        else:
            p1 = extractor(im1)
            p2 = extractor(im2)

        n_levels = cfg.output_level + 1
        conv1x1 = [
            ConvLeaky(32, kernel_size=1, dtype=self.dtype, name=f"conv_1x1_{l}")
            for l in range(n_levels)
        ]
        estimator = FlowEstimatorDense(
            cfg.estimator_f_channels, out_channels=2, dtype=self.dtype,
            name="flow_estimators",
        )
        context = ContextNetwork(
            cfg.context_f_channels, dtype=self.dtype, name="context_networks"
        )
        sgu = SGUModel(dtype=self.dtype, name="sgi_model") if cfg.if_sgu_upsample else None
        sgu_out_conv = (
            SGUOutputConv(dtype=self.dtype, name="sgu_output_conv")
            if cfg.if_sgu_upsample
            else None
        )

        b = im1.shape[0]
        coarse_spatial = p1[0].shape[1:-1]

        if cfg.batch_directions:
            # Stacked streams: index [0:b] is the forward direction
            # (source=im1, target=im2), [b:2b] the backward one.  Each
            # shared-weight subnet runs ONCE per level on the 2b batch.
            flow = jnp.zeros((2 * b,) + coarse_spatial + (2,), jnp.float32)
            flows = []
            for level in range(n_levels):
                xa = jnp.concatenate([p1[level], p2[level]], axis=0)
                xb = jnp.concatenate([p2[level], p1[level]], axis=0)
                xa_1x1 = conv1x1[level](xa)
                flow_up = (
                    flow
                    if flow.shape[1:-1] == xa.shape[1:-1]
                    else upsample_flow_as(flow, xa)
                )
                if level == 0:
                    fb_warp = xb
                else:
                    if sgu is not None:
                        # target-frame 1x1 feats = source feats with the
                        # stream halves swapped (no second conv call)
                        xb_1x1 = jnp.concatenate(
                            [xa_1x1[b:], xa_1x1[:b]], axis=0
                        )
                        flow_up = sgu(flow_up, xa_1x1, xb_1x1)
                    fb_warp = warp_with_mask(xb, flow_up)
                ca, cb = xa, fb_warp
                if cfg.if_norm_before_cost_volume:
                    ca, cb = normalize_features(
                        ca, cb, cfg.norm_moments_across_channels,
                        cfg.norm_moments_across_images,
                    )
                corr = _leaky(cost_volume(ca, cb, cfg.search_range))
                feat, res = estimator(
                    jnp.concatenate(
                        [corr, xa_1x1, flow_up.astype(compute)], axis=-1
                    )
                )
                flow_mid = flow_up + res.astype(jnp.float32)
                fine = context(
                    jnp.concatenate([feat, flow_mid.astype(compute)], axis=-1)
                )
                flow = flow_mid + fine.astype(jnp.float32)
                flows.append((flow[:b], flow[b:]))

            im_a = jnp.concatenate([im1, im2], axis=0)
            flow_out = upsample_flow_as(flow, im_a)
            if sgu is not None:
                ga = sgu_out_conv(im_a)
                gb = jnp.concatenate([ga[b:], ga[:b]], axis=0)
                flow_out = sgu(flow, ga, gb, output_level_flow=flow_out)
            return {
                "flow_f": flow_out[:b],
                "flow_b": flow_out[b:],
                "flows": flows[::-1],  # finest-first like the reference
            }

        flow_f = jnp.zeros((b,) + coarse_spatial + (2,), jnp.float32)
        flow_b = jnp.zeros_like(flow_f)
        flows = []

        for level in range(n_levels):
            x1, x2 = p1[level], p2[level]
            x1_1x1 = conv1x1[level](x1)
            x2_1x1 = conv1x1[level](x2)

            flow_f_up = (
                flow_f
                if flow_f.shape[1:-1] == x1.shape[1:-1]
                else upsample_flow_as(flow_f, x1)
            )
            flow_b_up = (
                flow_b
                if flow_b.shape[1:-1] == x2.shape[1:-1]
                else upsample_flow_as(flow_b, x2)
            )
            if level == 0:
                f2_warp, f1_warp = x2, x1
            else:
                if sgu is not None:
                    flow_f_up = sgu(flow_f_up, x1_1x1, x2_1x1)
                    flow_b_up = sgu(flow_b_up, x2_1x1, x1_1x1)
                f2_warp = warp_with_mask(x2, flow_f_up)
                f1_warp = warp_with_mask(x1, flow_b_up)

            c1a, c2a = x1, f2_warp
            c2b, c1b = x2, f1_warp
            if cfg.if_norm_before_cost_volume:
                c1a, c2a = normalize_features(
                    c1a, c2a, cfg.norm_moments_across_channels,
                    cfg.norm_moments_across_images,
                )
                c2b, c1b = normalize_features(
                    c2b, c1b, cfg.norm_moments_across_channels,
                    cfg.norm_moments_across_images,
                )
            corr_f = _leaky(cost_volume(c1a, c2a, cfg.search_range))
            corr_b = _leaky(cost_volume(c2b, c1b, cfg.search_range))

            feat_f, res_f = estimator(
                jnp.concatenate([corr_f, x1_1x1, flow_f_up.astype(compute)], axis=-1)
            )
            feat_b, res_b = estimator(
                jnp.concatenate([corr_b, x2_1x1, flow_b_up.astype(compute)], axis=-1)
            )
            flow_f_mid = flow_f_up + res_f.astype(jnp.float32)
            flow_b_mid = flow_b_up + res_b.astype(jnp.float32)
            fine_f = context(
                jnp.concatenate([feat_f, flow_f_mid.astype(compute)], axis=-1)
            )
            fine_b = context(
                jnp.concatenate([feat_b, flow_b_mid.astype(compute)], axis=-1)
            )
            flow_f = flow_f_mid + fine_f.astype(jnp.float32)
            flow_b = flow_b_mid + fine_b.astype(jnp.float32)
            flows.append((flow_f, flow_b))

        flow_f_out = upsample_flow_as(flow_f, im1)
        flow_b_out = upsample_flow_as(flow_b, im2)
        if sgu is not None:
            g1 = sgu_out_conv(im1)
            g2 = sgu_out_conv(im2)
            flow_f_out = sgu(flow_f, g1, g2, output_level_flow=flow_f_out)
            flow_b_out = sgu(flow_b, g2, g1, output_level_flow=flow_b_out)

        return {
            "flow_f": flow_f_out,
            "flow_b": flow_b_out,
            "flows": flows[::-1],  # finest-first like the reference
        }
