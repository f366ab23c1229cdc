"""Shared NN building blocks — rank-generic conv / deconv stacks (flax.linen).

Parity notes (reference: /root/reference):
- ``conv`` ⇔ Flow-2D/model/IFNet.py:22-27 (Conv2d + PReLU) and the Conv3d twin at
  Flow-3D/model/IFNet.py:18-23.  Torch's (kernel=3, stride=2, padding=1) halves
  even spatial sizes, which equals XLA 'SAME' padding; we keep sizes /32-padded
  upstream so all strided shapes stay exact (removing the reference's per-step
  "correct shapes" cropping, IFNet.py:162-188).
- ``deconv`` ⇔ ConvTranspose(kernel=4, stride=2, padding=1) used in the IFBlock
  heads (IFNet.py:72-82) — exact 2x upsampling, equal to flax 'SAME' transpose.
- ``PReLU`` ⇔ torch.nn.PReLU(num_parameters=C) with per-channel slope init 0.25.

Layout: channels-last (NHWC / NDHWC); params are float32, compute dtype is the
caller's (bfloat16 on TPU for MXU-friendly convs).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class PReLU(nn.Module):
    """Per-channel parametric ReLU (torch PReLU parity, slope init 0.25)."""

    init_slope: float = 0.25

    @nn.compact
    def __call__(self, x):
        slope = self.param(
            "slope",
            lambda _key, shape: jnp.full(shape, self.init_slope, jnp.float32),
            (x.shape[-1],),
        ).astype(x.dtype)
        return jnp.where(x >= 0, x, slope * x)


class ConvPReLU(nn.Module):
    """Conv (+ bias) followed by per-channel PReLU."""

    features: int
    ndim: int = 2
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # explicit symmetric torch-style padding: XLA 'SAME' at stride 2 pads
        # (0, 1) while torch Conv2d(k=3, s=2, p=1) pads (1, 1) — the window
        # alignment must match for torch-checkpoint import parity
        p = (self.dilation * (self.kernel_size - 1)) // 2
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,) * self.ndim,
            strides=(self.stride,) * self.ndim,
            kernel_dilation=(self.dilation,) * self.ndim,
            padding=[(p, p)] * self.ndim,
            dtype=self.dtype,
        )(x)
        return PReLU()(x)


class DeconvPReLU(nn.Module):
    """2x transposed conv (+ bias) followed by PReLU."""

    features: int
    ndim: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(
            self.features,
            kernel_size=(4,) * self.ndim,
            strides=(2,) * self.ndim,
            padding="SAME",
            dtype=self.dtype,
        )(x)
        return PReLU()(x)


class ResConvBlock(nn.Module):
    """``x + convblock(x)`` residual pair as in IFNet.py:56-70 (version=2)."""

    features: int
    ndim: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = ConvPReLU(self.features, self.ndim, dtype=self.dtype)(x)
        y = ConvPReLU(self.features, self.ndim, dtype=self.dtype)(y)
        return x + y


def conv_stack(
    features: Sequence[int], ndim: int, strides: Sequence[int], dtype: Any = None
) -> list[nn.Module]:
    return [
        ConvPReLU(f, ndim, stride=s, dtype=dtype) for f, s in zip(features, strides)
    ]
