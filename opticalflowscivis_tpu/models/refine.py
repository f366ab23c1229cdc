"""Contextnet / Unet refinement — optional residual fusion stage of RIFE.

Parity (reference Flow-2D/model/refine.py; Conv3d port at Flow-3D/model/refine.py):
- ``Conv2`` ⇔ refine.py:24-35 (stride-2 conv + stride-1 conv, both PReLU).
- ``Contextnet`` ⇔ refine.py:38-60: 4-stage feature pyramid; at each stage the
  flow is halved (values rescaled by 0.5) and the features are backward-warped.
- ``Unet`` ⇔ refine.py:62-84: 4-down/4-up UNet over images, warps, mask, flow and
  both context pyramids, emitting a sigmoid residual image.

Disabled by default in the reference (IFNet.py:32 ``refine=False``) and here
(config flag ``refine`` on the RIFE pipeline).  Dimension-generic like IFNet.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from opticalflowscivis_tpu.models.layers import ConvPReLU, DeconvPReLU
from opticalflowscivis_tpu.ops import backward_warp, resize_flow


class Conv2(nn.Module):
    features: int
    ndim: int = 2
    stride: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = ConvPReLU(self.features, self.ndim, stride=self.stride, dtype=self.dtype)(x)
        x = ConvPReLU(self.features, self.ndim, stride=1, dtype=self.dtype)(x)
        return x


class Contextnet(nn.Module):
    """4-stage pyramid of flow-warped context features (refine.py:38-60)."""

    ndim: int = 2
    c: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, flow: jax.Array):
        feats = []
        for i in range(4):
            x = Conv2((2**i) * self.c, self.ndim, dtype=self.dtype)(x)
            flow = resize_flow(flow, x.shape[1:-1])
            feats.append(backward_warp(x, flow))
        return feats


class Unet(nn.Module):
    """Fusion UNet emitting a sigmoid residual (refine.py:62-84)."""

    ndim: int = 2
    c: int = 16
    out_channels: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, img0, img1, warped0, warped1, mask, flow, c0, c1):
        cat = jnp.concatenate
        s0 = Conv2(2 * self.c, self.ndim, dtype=self.dtype)(
            cat([img0, img1, warped0, warped1, mask, flow.astype(img0.dtype)], -1)
        )
        s1 = Conv2(4 * self.c, self.ndim, dtype=self.dtype)(cat([s0, c0[0], c1[0]], -1))
        s2 = Conv2(8 * self.c, self.ndim, dtype=self.dtype)(cat([s1, c0[1], c1[1]], -1))
        s3 = Conv2(16 * self.c, self.ndim, dtype=self.dtype)(cat([s2, c0[2], c1[2]], -1))
        x = DeconvPReLU(8 * self.c, self.ndim, dtype=self.dtype)(cat([s3, c0[3], c1[3]], -1))
        x = DeconvPReLU(4 * self.c, self.ndim, dtype=self.dtype)(cat([x, s2], -1))
        x = DeconvPReLU(2 * self.c, self.ndim, dtype=self.dtype)(cat([x, s1], -1))
        x = DeconvPReLU(self.c, self.ndim, dtype=self.dtype)(cat([x, s0], -1))
        x = nn.Conv(self.out_channels, kernel_size=(3,) * self.ndim, padding="SAME",
                    dtype=self.dtype)(x)
        return jax.nn.sigmoid(x)
