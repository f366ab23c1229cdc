"""RIFE HD v1/v2 legacy model zoo — architectures + torch checkpoint import.

The reference's ``inference_video.py:83-98`` / ``inference_img.py:25-40`` try
pretrained checkpoints in a fallback chain HDv2 → HDv3 → HD; the v1/v2
architectures live in ``Flow-2D/model/oldmodel/{IFNet_HD,IFNet_HDv2,RIFE_HD,
RIFE_HDv2}.py``.  This module provides TPU-native (flax, channels-last)
re-designs of both so old public RIFE-zoo checkpoints remain loadable:

- v1 (``IFNet_HD.py``): 4 IFBlocks (c=192/128/96/48) of SE-ResBlocks with
  BatchNorm, a **2-channel symmetric flow** (img1 warped by ``-F``), PixelShuffle
  flow heads; ContextNet/FusionNet trio (``RIFE_HD.py:64-126``) with k3
  SE-ResBlocks.
- v2 (``IFNet_HDv2.py``): 4 IFBlocks (same c) of plain conv stacks, 4-channel
  bidirectional flow, ConvTranspose heads; ContextNet/FusionNet of Conv2 pairs
  (``RIFE_HDv2.py:37-115``).

Inference composition (``RIFE_HD.py:191-214`` / ``RIFE_HDv2.py:176-200``):
flownet runs at half resolution, ContextNet extracts flow-warped feature
pyramids of each input, FusionNet fuses them into a sigmoid residual + blend
mask, ``pred = clip(blend + res, 0, 1)``.

Import notes: BatchNorm (eval mode) is folded into the preceding conv's
kernel/bias — exact for inference.  Flow channels are reparameterized from
torch (dx,dy) order to this repo's row-major (dy,dx) at every flow head and
every flow-consuming conv input (same scheme as ``ifnet_hd._permute_flow_channels``).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from opticalflowscivis_tpu.models.layers import PReLU
from opticalflowscivis_tpu.ops import backward_warp, resize_flow, resize_spatial


class SharedPReLU(nn.Module):
    """torch ``PReLU(num_parameters=1)`` — one slope shared by all channels."""

    @nn.compact
    def __call__(self, x):
        slope = self.param(
            "slope", lambda _k, s: jnp.full(s, 0.25, jnp.float32), (1,)
        ).astype(x.dtype)
        return jnp.where(x >= 0, x, slope * x)


def pixel_shuffle(x: jax.Array, r: int = 2) -> jax.Array:
    """Channels-last PixelShuffle: ``[B,H,W,c·r²] → [B,H·r,W·r,c]``.

    Matches torch ``nn.PixelShuffle`` channel ordering (index = c·r² + i·r + j)
    so imported head kernels line up exactly.
    """
    b, h, w, cr2 = x.shape
    c = cr2 // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    return x.transpose(0, 1, 4, 2, 5, 3).reshape(b, h * r, w * r, c)


def _conv(features, k, stride=1, use_bias=True, name=None):
    p = (k - 1) // 2
    return nn.Conv(features, kernel_size=(k, k), strides=(stride, stride),
                   padding=[(p, p)] * 2, use_bias=use_bias, name=name)


class SEResBlock(nn.Module):
    """Squeeze-excite residual block (two variants share one module).

    ``bn=True`` → IFNet_HD.ResBlock (k5 conv1, BatchNorm — folded into bias at
    import, PReLU at Sequential index 2); ``bn=False`` → RIFE_HD.ResBlock (k3,
    bias convs, PReLU at index 1).  Child names mirror the torch attribute/
    Sequential-index structure so the importer maps keys 1:1.
    """

    features: int
    stride: int = 1
    bn: bool = True
    in_features: int | None = None  # only to decide whether conv0 projects

    @nn.compact
    def __call__(self, x):
        k1 = 5 if self.bn else 3
        prelu_idx = 2 if self.bn else 1
        needs_proj = self.stride != 1 or (
            self.in_features is not None and self.in_features != self.features
        )
        y = (_conv(self.features, 3, self.stride, use_bias=False, name="conv0")(x)
             if needs_proj else x)
        h = _conv(self.features, k1, self.stride, name="conv1_0")(x)
        h = PReLU(name=f"conv1_{prelu_idx}")(h)
        h = _conv(self.features, 3, name="conv2_0")(h)
        w = jnp.mean(h, axis=(1, 2), keepdims=True)
        w = SharedPReLU(name="relu1")(_conv(16, 1, use_bias=False, name="fc1")(w))
        w = jax.nn.sigmoid(_conv(self.features, 1, use_bias=False, name="fc2")(w))
        return PReLU(name="relu2")(h * w + y)


class Conv2HD(nn.Module):
    """RIFE_HDv2 ``Conv2``: stride-s conv + stride-1 conv, each with PReLU."""

    features: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        x = _conv(self.features, 3, self.stride, name="conv1_0")(x)
        x = PReLU(name="conv1_1")(x)
        x = _conv(self.features, 3, name="conv2_0")(x)
        return PReLU(name="conv2_1")(x)


def _deconv(x, features, name):
    """``deconv``: ConvTranspose(k4,s2,p1) + PReLU (RIFE_HD.py:24-29), emitted
    inside a parent ``@nn.compact`` with flat names (``up0_0``/``up0_1``)
    matching the importer's merged torch keys."""
    x = nn.ConvTranspose(features, kernel_size=(4, 4), strides=(2, 2),
                         padding="SAME", name=f"{name}_0")(x)
    return PReLU(name=f"{name}_1")(x)


# ---------------------------------------------------------------------------
# v1 (IFNet_HD / RIFE_HD)
# ---------------------------------------------------------------------------


class IFBlockHDv1(nn.Module):
    """IFNet_HD.IFBlock (:53-83): k5-s2 conv, 6 SE-ResBlocks, PixelShuffle head.

    Emits a 2-channel symmetric flow; no value rescale on the block-level
    resizes (the torch code resizes flow spatially only).
    """

    c: int = 64
    scale: int = 1

    @nn.compact
    def __call__(self, x):
        full = x.shape[1:-1]
        if self.scale != 1:
            x = resize_spatial(x, tuple(s // self.scale for s in full))
        x = _conv(self.c, 5, 2, name="conv0_0")(x)
        x = PReLU(name="conv0_2")(x)
        for r in range(6):
            x = SEResBlock(self.c, bn=True, name=f"res{r}")(x)
        x = _conv(8, 3, name="conv1")(x)
        flow = pixel_shuffle(x, 2)
        if self.scale != 1:
            flow = resize_spatial(flow, full)
        return flow


class IFNetHDv1(nn.Module):
    """IFNet_HD.IFNet (:86-113): 4 blocks, cumulative symmetric 2-ch flow.

    Runs at half input resolution (torch downscales by 0.5·scale at entry and
    returns the flow at that grid; the wrapper upsamples by 2 for fusion).
    """

    cs: Sequence[int] = (192, 128, 96, 48)

    @nn.compact
    def __call__(self, img0: jax.Array, img1: jax.Array, scale: float = 1.0):
        x = jnp.concatenate([img0, img1], axis=-1)
        half = tuple(int(s * 0.5 * scale) for s in x.shape[1:-1])
        x = resize_spatial(x, half)
        scales = (8, 4, 2, 1)
        flow = None
        flow_list = []
        for i, (c, s) in enumerate(zip(self.cs, scales)):
            if flow is None:
                inp = x
            else:
                w0 = backward_warp(x[..., :3], flow)
                w1 = backward_warp(x[..., 3:], -flow)
                inp = jnp.concatenate([w0, w1, flow.astype(x.dtype)], axis=-1)
            res = IFBlockHDv1(c, scale=s, name=f"block{i}")(inp)
            flow = res if flow is None else flow + res
            flow_list.append(flow)
        if scale != 1.0:
            flow = resize_flow(flow, tuple(s // 2 for s in img0.shape[1:-1]))
            flow_list[-1] = flow
        return flow, flow_list


class ContextNetHDv1(nn.Module):
    """RIFE_HD.ContextNet (:64-90): conv + 4 stride-2 SE-ResBlocks, each stage
    warped by a progressively halved flow."""

    c: int = 32

    @nn.compact
    def __call__(self, x: jax.Array, flow: jax.Array):
        x = _conv(self.c, 3, 2, name="conv0_0")(x)
        x = PReLU(name="conv0_1")(x)
        feats = []
        chans = (self.c, 2 * self.c, 4 * self.c, 8 * self.c)
        in_chans = (self.c, self.c, 2 * self.c, 4 * self.c)
        for i, (co, ci) in enumerate(zip(chans, in_chans)):
            x = SEResBlock(co, stride=2, bn=False, in_features=ci,
                           name=f"conv{i + 1}")(x)
            flow = resize_flow(flow, x.shape[1:-1])
            feats.append(backward_warp(x, flow))
        return feats


class FusionNetHDv1(nn.Module):
    """RIFE_HD.FusionNet (:93-126): U-net over warped inputs + context feats;
    16-ch conv + PixelShuffle head → 4 channels (3 residual + 1 mask)."""

    c: int = 32

    @nn.compact
    def __call__(self, img0, img1, flow, c0, c1):
        warped0 = backward_warp(img0, flow)
        warped1 = backward_warp(img1, -flow)
        x = jnp.concatenate([warped0, warped1, flow.astype(img0.dtype)], axis=-1)
        x = _conv(self.c, 3, 2, name="conv0_0")(x)
        x = PReLU(name="conv0_1")(x)
        c = self.c
        s0 = SEResBlock(2 * c, 2, bn=False, in_features=c, name="down0")(x)
        s1 = SEResBlock(4 * c, 2, bn=False, in_features=4 * c, name="down1")(
            jnp.concatenate([s0, c0[0], c1[0]], -1))
        s2 = SEResBlock(8 * c, 2, bn=False, in_features=8 * c, name="down2")(
            jnp.concatenate([s1, c0[1], c1[1]], -1))
        s3 = SEResBlock(16 * c, 2, bn=False, in_features=16 * c, name="down3")(
            jnp.concatenate([s2, c0[2], c1[2]], -1))
        x = _deconv(jnp.concatenate([s3, c0[3], c1[3]], -1), 8 * c, "up0")
        x = _deconv(jnp.concatenate([x, s2], -1), 4 * c, "up1")
        x = _deconv(jnp.concatenate([x, s1], -1), 2 * c, "up2")
        x = _deconv(jnp.concatenate([x, s0], -1), c, "up3")
        x = _conv(16, 3, name="conv")(x)
        out = pixel_shuffle(x, 2)
        return out, warped0, warped1


# ---------------------------------------------------------------------------
# v2 (IFNet_HDv2 / RIFE_HDv2)
# ---------------------------------------------------------------------------


class IFBlockHDv2(nn.Module):
    """IFNet_HDv2.IFBlock (:24-53): two stride-2 convs, 6 convs, ConvTranspose
    head → 4-ch flow at half the block-input resolution."""

    c: int = 64
    scale: int = 1

    @nn.compact
    def __call__(self, x):
        full = x.shape[1:-1]
        if self.scale != 1:
            x = resize_spatial(x, tuple(s // self.scale for s in full))
        x = _conv(self.c, 3, 2, name="conv0_0_0")(x)
        x = PReLU(name="conv0_0_1")(x)
        x = _conv(2 * self.c, 3, 2, name="conv0_1_0")(x)
        x = PReLU(name="conv0_1_1")(x)
        for j in range(6):
            x = _conv(2 * self.c, 3, name=f"convblock_{j}_0")(x)
            x = PReLU(name=f"convblock_{j}_1")(x)
        flow = nn.ConvTranspose(4, kernel_size=(4, 4), strides=(2, 2),
                                padding="SAME", name="conv1")(x)
        if self.scale != 1:
            flow = resize_spatial(flow, tuple(s // 2 for s in full))
        return flow


class IFNetHDv2(nn.Module):
    """IFNet_HDv2.IFNet (:56-86): 4 blocks, bidirectional 4-ch flow carried at
    half resolution; ``F_large`` (2× resize, ×2 values) drives full-res warps."""

    cs: Sequence[int] = (192, 128, 96, 48)

    @nn.compact
    def __call__(self, img0: jax.Array, img1: jax.Array, scale: float = 1.0):
        x = jnp.concatenate([img0, img1], axis=-1)
        if scale != 1.0:
            x = resize_spatial(x, tuple(int(s * scale) for s in x.shape[1:-1]))
        full = x.shape[1:-1]
        flow = None
        flow_list = []
        for i, (c, s) in enumerate(zip(self.cs, (8, 4, 2, 1))):
            if flow is None:
                inp = x
            else:
                large = resize_flow(flow, full)
                w0 = backward_warp(x[..., :3], large[..., :2])
                w1 = backward_warp(x[..., 3:], large[..., 2:4])
                inp = jnp.concatenate([w0, w1, large.astype(x.dtype)], axis=-1)
            res = IFBlockHDv2(c, scale=s, name=f"block{i}")(inp)
            flow = res if flow is None else flow + res
            flow_list.append(flow)
        if scale != 1.0:
            flow = resize_flow(flow, tuple(s // 2 for s in img0.shape[1:-1]))
            flow_list[-1] = flow
        return flow, flow_list


class ContextNetHDv2(nn.Module):
    """RIFE_HDv2.ContextNet: 5 Conv2 stages, warped from stage 2 on."""

    c: int = 32

    @nn.compact
    def __call__(self, x: jax.Array, flow: jax.Array):
        x = Conv2HD(self.c, name="conv0")(x)
        feats = []
        for i, co in enumerate((self.c, 2 * self.c, 4 * self.c, 8 * self.c)):
            x = Conv2HD(co, name=f"conv{i + 1}")(x)
            flow = resize_flow(flow, x.shape[1:-1])
            feats.append(backward_warp(x, flow))
        return feats


class FusionNetHDv2(nn.Module):
    """RIFE_HDv2.FusionNet: Conv2 U-net; ConvTranspose head → 4 channels."""

    c: int = 32

    @nn.compact
    def __call__(self, img0, img1, flow, c0, c1):
        warped0 = backward_warp(img0, flow[..., :2])
        warped1 = backward_warp(img1, flow[..., 2:4])
        x = jnp.concatenate([warped0, warped1, flow.astype(img0.dtype)], axis=-1)
        x = Conv2HD(self.c, name="conv0")(x)
        c = self.c
        s0 = Conv2HD(2 * c, name="down0")(x)
        s1 = Conv2HD(4 * c, name="down1")(jnp.concatenate([s0, c0[0], c1[0]], -1))
        s2 = Conv2HD(8 * c, name="down2")(jnp.concatenate([s1, c0[1], c1[1]], -1))
        s3 = Conv2HD(16 * c, name="down3")(jnp.concatenate([s2, c0[2], c1[2]], -1))
        x = _deconv(jnp.concatenate([s3, c0[3], c1[3]], -1), 8 * c, "up0")
        x = _deconv(jnp.concatenate([x, s2], -1), 4 * c, "up1")
        x = _deconv(jnp.concatenate([x, s1], -1), 2 * c, "up2")
        x = _deconv(jnp.concatenate([x, s0], -1), c, "up3")
        out = nn.ConvTranspose(4, kernel_size=(4, 4), strides=(2, 2),
                               padding="SAME", name="conv")(x)
        return out, warped0, warped1


# ---------------------------------------------------------------------------
# composed inference (RIFE_HD.Model.predict / RIFE_HDv2.Model.predict)
# ---------------------------------------------------------------------------


class RIFEHDLegacy:
    """Functional wrapper composing flownet/contextnet/fusionnet for inference.

    ``params`` is ``{"flownet": ..., "contextnet": ..., "fusionnet": ...}`` as
    produced by :func:`load_torch_rife_hd_legacy` (or by ``.init`` of the three
    modules for tests).
    """

    def __init__(self, version: int = 2, c_fusion: int = 32,
                 cs: Sequence[int] = (192, 128, 96, 48)):
        if version not in (1, 2):
            raise ValueError("version must be 1 (RIFE_HD) or 2 (RIFE_HDv2)")
        self.version = version
        if version == 1:
            self.flownet = IFNetHDv1(cs=tuple(cs))
            self.contextnet = ContextNetHDv1(c_fusion)
            self.fusionnet = FusionNetHDv1(c_fusion)
        else:
            self.flownet = IFNetHDv2(cs=tuple(cs))
            self.contextnet = ContextNetHDv2(c_fusion)
            self.fusionnet = FusionNetHDv2(c_fusion)

    def init(self, key, spatial=(64, 64)):
        k0, k1, k2 = jax.random.split(key, 3)
        img = jnp.zeros((1, *spatial, 3))
        half = tuple(s // 2 for s in spatial)
        nflow = 2 if self.version == 1 else 4
        flow_half = jnp.zeros((1, *half, nflow))
        flow_full = jnp.zeros((1, *spatial, nflow))
        return {
            "flownet": self.flownet.init(k0, img, img)["params"],
            "contextnet": self.contextnet.init(
                k1, img, flow_half[..., :2])["params"],
            "fusionnet": self.fusionnet.init(
                k2, img, img, flow_full, *self._ctx_shapes(k1, img, flow_half)
            )["params"],
        }

    def _ctx_shapes(self, key, img, flow_half):
        feats = self.contextnet.init_with_output(
            key, img, flow_half[..., :2])[0]
        return feats, feats

    def predict(self, params, img0, img1, flow):
        """RIFE_HD.Model.predict:191-208 / RIFE_HDv2:176-200 (training=False)."""
        if self.version == 1:
            c0 = self.contextnet.apply({"params": params["contextnet"]}, img0, flow)
            c1 = self.contextnet.apply({"params": params["contextnet"]}, img1, -flow)
        else:
            c0 = self.contextnet.apply(
                {"params": params["contextnet"]}, img0, flow[..., :2])
            c1 = self.contextnet.apply(
                {"params": params["contextnet"]}, img1, flow[..., 2:4])
        flow = resize_flow(flow, img0.shape[1:-1])
        out, warped0, warped1 = self.fusionnet.apply(
            {"params": params["fusionnet"]}, img0, img1, flow, c0, c1)
        res = jax.nn.sigmoid(out[..., :3]) * 2 - 1
        mask = jax.nn.sigmoid(out[..., 3:4])
        merged = warped0 * mask + warped1 * (1 - mask)
        pred = jnp.clip(merged + res, 0.0, 1.0)
        return pred, flow, mask

    def inference(self, params, img0, img1, scale: float = 1.0):
        flow, _ = self.flownet.apply(
            {"params": params["flownet"]}, img0, img1, scale)
        return self.predict(params, img0, img1, flow)


# ---------------------------------------------------------------------------
# torch checkpoint import
# ---------------------------------------------------------------------------

_BN_EPS = 1e-5


def _merge_numeric(parts: list[str]) -> list[str]:
    out: list[str] = []
    for p in parts:
        if p.isdigit() and out:
            out[-1] = f"{out[-1]}_{p}"
        else:
            out.append(p)
    return out


def _convert_module_state(state: dict, deconv_paths: set[str]) -> dict:
    """Generic torch-Sequential state_dict → flax params with BN folding.

    Buckets tensors by torch module path; BatchNorm buckets (detected via
    ``running_mean``) fold into the preceding conv of the same Sequential;
    PReLU buckets become ``slope`` leaves; conv/deconv kernels transpose to
    HWIO (deconvs additionally flip taps — XLA transposed-conv semantics).
    """
    import re

    buckets: dict[str, dict[str, np.ndarray]] = {}
    for key, tensor in state.items():
        key = key.replace("module.", "")
        mod, leaf = key.rsplit(".", 1)
        buckets.setdefault(mod, {})[leaf] = np.asarray(
            tensor.detach().numpy(), np.float32)

    params: dict = {}

    def put(mod_path: str, leaves: dict[str, np.ndarray]) -> None:
        node = params
        for p in _merge_numeric(mod_path.split(".")):
            node = node.setdefault(p, {})
        for k, v in leaves.items():
            node[k] = jnp.asarray(v)

    for mod, tensors in sorted(buckets.items()):
        if "running_mean" in tensors:  # BN → fold into preceding conv
            prev = re.sub(r"(\d+)$", lambda m: str(int(m.group(1)) - 1), mod)
            conv = buckets[prev]
            scale = tensors["weight"] / np.sqrt(tensors["running_var"] + _BN_EPS)
            conv["weight"] = conv["weight"] * scale[:, None, None, None]
            conv["bias"] = conv.get("bias", 0.0) * scale + (
                tensors["bias"] - tensors["running_mean"] * scale)
            continue
    for mod, tensors in sorted(buckets.items()):
        if "running_mean" in tensors:
            continue
        w = tensors.get("weight")
        if w is not None and w.ndim == 4:
            if mod in deconv_paths:
                kernel = np.flip(w.transpose(2, 3, 0, 1), axis=(0, 1)).copy()
            else:
                kernel = w.transpose(2, 3, 1, 0)
            leaves = {"kernel": kernel}
            if "bias" in tensors:
                leaves["bias"] = tensors["bias"]
            put(mod, leaves)
        elif w is not None and w.ndim == 1 and len(tensors) == 1:
            put(mod, {"slope": w})
        else:
            raise KeyError(f"unrecognized torch module {mod}: {list(tensors)}")
    return params


def _permute_rows(kernel, start, perm):
    idx = list(range(kernel.shape[2]))
    idx[start:start + len(perm)] = [start + p for p in perm]
    return kernel[:, :, jnp.asarray(idx), :]


def _permute_legacy_flow(params: dict, version: int) -> dict:
    """Reparameterize flow channels to row-major (dy,dx) — exact, see module doc."""
    fl = params["flownet"]
    if version == 1:
        head_perm = [4, 5, 6, 7, 0, 1, 2, 3]  # swap (u,v) pre-PixelShuffle
        in_perm, in_start = [1, 0], 6
        head = "conv1"
    else:
        head_perm = [1, 0, 3, 2]
        in_perm, in_start = [1, 0, 3, 2], 6
        head = "conv1"
    for i in range(4):
        blk = fl[f"block{i}"]
        blk[head]["kernel"] = blk[head]["kernel"][..., jnp.asarray(head_perm)]
        blk[head]["bias"] = blk[head]["bias"][jnp.asarray(head_perm)]
        if i > 0:  # blocks 1-3 consume [w0, w1, flow] — permute flow input rows
            first = "conv0_0" if version == 1 else "conv0_0_0"
            blk[first]["kernel"] = _permute_rows(
                blk[first]["kernel"], in_start, in_perm)
    fuse_first = "conv0_0" if version == 1 else "conv0/conv1_0"
    fnode = params["fusionnet"]
    for part in fuse_first.split("/"):
        fnode = fnode[part]
    fperm = [1, 0] if version == 1 else [1, 0, 3, 2]
    fnode["kernel"] = _permute_rows(fnode["kernel"], 6, fperm)
    return params


def load_torch_rife_hd_legacy(path: str, version: int) -> dict:
    """Load a RIFE HD v1/v2 checkpoint directory (flownet/contextnet/unet.pkl).

    Mirrors ``RIFE_HD(v2).Model.load_model`` (strips DDP prefixes); BatchNorm
    folded (v1), flow channels converted to row-major.
    """
    import os

    import torch

    deconvs: set[str] = set()
    if version == 2:
        deconvs |= {f"block{i}.conv1" for i in range(4)}
    fuse_deconvs = {f"up{i}.0" for i in range(4)}
    if version == 2:
        fuse_deconvs.add("conv")

    def load(name, dec):
        state = torch.load(os.path.join(path, name), map_location="cpu",
                           weights_only=True)
        return _convert_module_state(state, dec)

    params = {
        "flownet": load("flownet.pkl", deconvs),
        "contextnet": load("contextnet.pkl", set()),
        "fusionnet": load("unet.pkl", fuse_deconvs),
    }
    return _permute_legacy_flow(params, version)
