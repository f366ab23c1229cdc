"""Inference engine — pair/series interpolation with recursive bisection.

Parity map:
- ``Interpolator.pair``   ⇔ RIFE ``Model.inference`` (Flow-2D/model/RIFE.py:
  66-78): student-only forward, returns merged frame + flow + mask; /32 padding
  handled here once (inference_img.py:56-61) instead of per-block cropping.
- ``interpolate_recursive`` ⇔ ``make_inference`` (Flow-2D/inference_video.py:
  172-202): to insert 2^exp - 1 frames, predict the midpoint and recurse.
- ``interpolate_series``  ⇔ the inference_video pipeline (:74-392): decimate a
  series by ``factor`` and reconstruct the missing frames pairwise — without the
  reference's mp4 round-trip (arrays in, arrays out; video IO lives in the CLI).
- duplicate-frame / scene-cut SSIM gates (:244-275) are reproduced as options.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from opticalflowscivis_tpu.models.ifnet import IFNet
from opticalflowscivis_tpu.ops import ssim


class Interpolator:
    """Jitted student-only IFNet forward with automatic /32 padding."""

    def __init__(self, model: IFNet, params, pad_multiple: int = 32,
                 tta: bool = False):
        self.model = model
        self.params = params
        self.pad_multiple = pad_multiple
        self.tta = tta

        @jax.jit
        def _forward(params, img0, img1, timestep):
            out = model.apply(params, img0, img1, None, timestep=timestep)
            return out["merged"][-1], out["flow_list"][-1], out["mask_list"][-1]

        @jax.jit
        def _forward_tta(params, img0, img1, timestep):
            """Flip-averaged inference ⇔ RIFE.py:66-78 (TTA=True).

            Second pass on inputs mirrored along every spatial axis; the
            un-mirrored merged frames are averaged.  The reference returns only
            the merged frame in TTA mode; flow/mask here stay from the primary
            pass.  Note the reference evaluates the flipped pass at the SAME
            timestep (no 1-t reversal) — mirrored here.
            """
            merged, flow, mask = _forward(params, img0, img1, timestep)
            spatial = tuple(range(1, img0.ndim - 1))
            m2, _, _ = _forward(
                params, jnp.flip(img0, spatial), jnp.flip(img1, spatial), timestep
            )
            return (merged + jnp.flip(m2, spatial)) / 2, flow, mask

        self._forward_plain = _forward
        self._forward = _forward_tta if tta else _forward

    def _pad(self, x: np.ndarray):
        m = self.pad_multiple
        pads = [(0, 0)]
        for s in x.shape[1:-1]:
            pads.append((0, (-s) % m))
        pads.append((0, 0))
        return np.pad(x, pads, mode="edge"), x.shape

    def pair(self, img0: np.ndarray, img1: np.ndarray, timestep: float = 0.5):
        """Predict the frame at ``timestep`` between two ``[B, *S, C]`` frames."""
        p0, orig_shape = self._pad(np.asarray(img0, np.float32))
        p1, _ = self._pad(np.asarray(img1, np.float32))
        merged, flow, mask = self._forward(
            self.params, jnp.asarray(p0), jnp.asarray(p1), timestep
        )
        crop = tuple(slice(0, s) for s in orig_shape)
        return (
            np.asarray(merged, np.float32)[crop],
            np.asarray(flow, np.float32)[tuple(list(crop[:-1]) + [slice(None)])],
            np.asarray(mask, np.float32)[crop],
        )


def interpolate_recursive(
    interp: Interpolator, img0: np.ndarray, img1: np.ndarray, n: int
) -> list[np.ndarray]:
    """Insert ``n`` (= 2^k - 1) frames between img0/img1 by midpoint bisection."""
    if n <= 0:
        return []
    middle, _, _ = interp.pair(img0, img1)
    if n == 1:
        return [middle]
    left = interpolate_recursive(interp, img0, middle, n // 2)
    right = interpolate_recursive(interp, middle, img1, n // 2)
    # exact midpoint kept only for odd n — make_inference semantics
    # (inference_video.py:172-202)
    return left + [middle] + right if n % 2 else left + right


def interpolate_ratio(
    interp: Interpolator,
    img0: np.ndarray,
    img1: np.ndarray,
    ratio: float,
    rthreshold: float = 0.02,
    rmaxcycles: int = 8,
) -> np.ndarray:
    """Frame at an arbitrary time ``ratio`` via midpoint bisection.

    ⇔ inference_img.py:64-87: repeatedly predict midpoints and recurse toward
    the target ratio until within ``rthreshold`` or ``rmaxcycles`` reached.
    """
    if ratio <= rthreshold:
        return np.asarray(img0)
    if ratio >= 1 - rthreshold:
        return np.asarray(img1)
    lo, hi = 0.0, 1.0
    a, b = np.asarray(img0), np.asarray(img1)
    middle = None
    for _ in range(rmaxcycles):
        mid_t = (lo + hi) / 2
        middle, _, _ = interp.pair(a, b)
        if abs(mid_t - ratio) <= rthreshold:
            return middle
        if ratio > mid_t:
            a, lo = middle, mid_t
        else:
            b, hi = middle, mid_t
    return middle


def interpolate_series(
    interp: Interpolator,
    frames: np.ndarray,
    factor: int,
    dup_ssim_gate: float | None = None,
    cut_ssim_gate: float | None = None,
    collect_flow: bool = False,
):
    """Decimate ``[T, *S, C]`` by ``factor`` and reconstruct by interpolation.

    Returns (reconstruction of length ``(T//factor-1)*factor + 1``, flows or None).
    ``dup_ssim_gate`` copies img0 when the pair is near-identical (>gate);
    ``cut_ssim_gate`` copies img0 on scene cuts (<gate) — inference_video.py:244-275.

    Power-of-two factors without SSIM gates dispatch to the device-resident
    batched path (identical bisection semantics, one upload / one download).
    """
    if (
        factor >= 2 and factor & (factor - 1) == 0
        and dup_ssim_gate is None and cut_ssim_gate is None
        and type(interp) is Interpolator  # zoo wrappers: different _forward
    ):
        return interpolate_series_device(interp, frames, factor, collect_flow)
    kept = frames[::factor]
    out: list[np.ndarray] = []
    flows: list[np.ndarray] = []
    for a, b in zip(kept[:-1], kept[1:]):
        out.append(a)
        pair_ssim = None
        if dup_ssim_gate is not None or cut_ssim_gate is not None:
            pair_ssim = float(ssim(jnp.asarray(a[None]), jnp.asarray(b[None])))
        if (
            (dup_ssim_gate is not None and pair_ssim > dup_ssim_gate)
            or (cut_ssim_gate is not None and pair_ssim < cut_ssim_gate)
        ):
            mids = [a.copy() for _ in range(factor - 1)]
        else:
            mids = interpolate_recursive(interp, a[None], b[None], factor - 1)
            mids = [m[0] for m in mids]
            if collect_flow:
                _, flow, _ = interp.pair(a[None], b[None])
                flows.append(flow[0])
        out.extend(mids)
    out.append(kept[-1])
    recon = np.stack(out)
    return recon, (np.stack(flows) if flows else None)


def interpolate_series_device(
    interp: Interpolator,
    frames: np.ndarray,
    factor: int,
    collect_flow: bool = False,
):
    """Device-resident ``interpolate_series`` for power-of-two factors.

    The sequential path round-trips every frame over the host link per
    ``pair`` call — on the TPU relay (~2 MB/s) that costs ~1 s/frame and
    dwarfs device time.  Here the kept frames upload ONCE, every bisection
    level runs as one batched jitted forward entirely on device, and the
    reconstruction downloads ONCE, preserving the recursive-midpoint
    semantics of make_inference (inference_video.py:172-202): level d fills
    the midpoints of all known pairs at gap ``factor/2^d`` simultaneously.
    """
    import jax

    assert factor & (factor - 1) == 0 and factor >= 2
    kept = np.asarray(frames[::factor], np.float32)
    if kept.shape[0] < 2:
        return np.asarray(frames[:1], np.float32), None
    padded, orig_shape = interp._pad(kept)
    n_out = (kept.shape[0] - 1) * factor + 1
    # recon buffer on device, padded shapes; filled level by level
    recon = jnp.zeros((n_out,) + padded.shape[1:], jnp.float32)
    recon = recon.at[::factor].set(jnp.asarray(padded))

    from functools import partial

    @partial(jax.jit, static_argnums=(1,))
    def fill_level(recon, gap):
        starts = jnp.arange(0, n_out - 1, gap)
        a = recon[starts]
        b = recon[starts + gap]
        merged, _, _ = interp._forward(interp.params, a, b, 0.5)
        return recon.at[starts + gap // 2].set(merged.astype(jnp.float32))

    gap = factor
    while gap > 1:
        recon = fill_level(recon, gap)
        gap //= 2

    flows = None
    if collect_flow:
        a = jnp.asarray(padded[:-1])
        b = jnp.asarray(padded[1:])
        _, flow, _ = interp._forward(interp.params, a, b, 0.5)
        crop = (slice(None),) + tuple(slice(0, s) for s in orig_shape[1:-1])
        flows = np.asarray(flow, np.float32)[crop]

    crop = (slice(None),) + tuple(slice(0, s) for s in orig_shape[1:-1])
    return np.asarray(recon, np.float32)[crop], flows


def batched_pair_inference(
    interp: Interpolator, tuples: np.ndarray, batch_size: int = 16
):
    """Run ``pair`` over grouped test tuples ``[N, slots, *S, C]`` (density ch).

    Returns dict of stacked (pred, flow, mask, gt) — the test-mode collection
    loop of Flow-2D/train.py:253-374.
    """
    preds, flows, masks, gts = [], [], [], []
    for i in range(0, tuples.shape[0], batch_size):
        chunk = tuples[i : i + batch_size]
        img0 = chunk[:, 0, ..., :1]
        img1 = chunk[:, 1, ..., :1]
        gt = chunk[:, 2, ..., :1]
        pred, flow, mask = interp.pair(img0, img1)
        preds.append(pred)
        flows.append(flow)
        masks.append(mask)
        gts.append(gt)
    return {
        "pred": np.concatenate(preds),
        "flow": np.concatenate(flows),
        "mask": np.concatenate(masks),
        "gt": np.concatenate(gts),
    }


# ---------------------------------------------------------------------------
# Pretrained model-zoo loading (RIFE HD / HDv2 / HDv3 fallback chain)
# ---------------------------------------------------------------------------


class ZooInterpolator:
    """``Interpolator``-compatible wrapper around a pretrained RIFE-zoo model.

    Zoo models are RGB midpoint interpolators: single-channel SciVis frames are
    tiled to 3 channels on the way in and averaged back on the way out (the
    reference feeds grayscale frames re-read from RGB mp4s the same way,
    inference_video.py:308-324).
    """

    def __init__(self, kind: str, model, params, pad_multiple: int):
        self.kind = kind
        self.model = model
        self.params = params
        self.pad_multiple = pad_multiple
        if kind == "hdv3":
            @jax.jit
            def _forward(params, img0, img1):
                out = model.apply(params, img0, img1)
                return out["merged"][-1], out["flow_list"][-1], out["mask"]
        else:
            @jax.jit
            def _forward(params, img0, img1):
                return model.inference(params, img0, img1)
        self._forward = _forward

    _pad = Interpolator._pad

    def pair(self, img0: np.ndarray, img1: np.ndarray, timestep: float = 0.5):
        if timestep != 0.5:
            raise ValueError(
                f"{self.kind} zoo models are midpoint-only interpolators; use "
                "recursive bisection (interpolate_recursive) for other ratios")
        p0, orig_shape = self._pad(np.asarray(img0, np.float32))
        p1, _ = self._pad(np.asarray(img1, np.float32))
        mono = p0.shape[-1] == 1
        if mono:
            p0 = np.tile(p0, (1,) * (p0.ndim - 1) + (3,))
            p1 = np.tile(p1, (1,) * (p1.ndim - 1) + (3,))
        merged, flow, mask = self._forward(
            self.params, jnp.asarray(p0), jnp.asarray(p1))
        merged = np.asarray(merged, np.float32)
        if mono:
            merged = merged.mean(axis=-1, keepdims=True)
        crop = tuple(slice(0, s) for s in orig_shape[:-1])
        flow = np.asarray(flow, np.float32)
        if flow.shape[1:-1] != merged.shape[1:-1]:  # legacy nets: half-res flow
            from opticalflowscivis_tpu.ops import resize_flow

            flow = np.asarray(resize_flow(jnp.asarray(flow),
                                          merged.shape[1:-1]), np.float32)
        mask = np.asarray(mask, np.float32)
        return (
            merged[crop + (slice(None),)],
            flow[crop + (slice(None),)],
            mask[crop + (slice(None),)],
        )


def load_pretrained_zoo(model_dir: str) -> ZooInterpolator:
    """Load a pretrained RIFE checkpoint directory, trying newest-first.

    Reference fallback chain (inference_img.py:25-40, inference_video.py:83-98):
    try RIFE_HDv2, then v3.6 HDv3, then RIFE_HD.  Here detection is structural:
    a ``contextnet.pkl``/``unet.pkl`` trio means a legacy (v1/v2) checkpoint —
    distinguished by the flownet key signature — otherwise a lone
    ``flownet.pkl`` is HDv3.
    """
    import os

    trio = all(
        os.path.exists(os.path.join(model_dir, f))
        for f in ("flownet.pkl", "contextnet.pkl", "unet.pkl")
    )
    if trio:
        import torch

        from opticalflowscivis_tpu.models.ifnet_hd_legacy import (
            RIFEHDLegacy,
            load_torch_rife_hd_legacy,
        )

        state = torch.load(os.path.join(model_dir, "flownet.pkl"),
                           map_location="cpu", weights_only=True)
        ctx = torch.load(os.path.join(model_dir, "contextnet.pkl"),
                         map_location="cpu", weights_only=True)
        state = {k.replace("module.", ""): v for k, v in state.items()}
        ctx = {k.replace("module.", ""): v for k, v in ctx.items()}
        version = 2 if any("convblock" in k for k in state) else 1
        # architecture widths read off the checkpoint itself
        first = "conv0.0.0.weight" if version == 2 else "conv0.0.weight"
        cs = tuple(int(state[f"block{i}.{first}"].shape[0]) for i in range(4))
        ctx_first = "conv0.conv1.0.weight" if version == 2 else "conv0.0.weight"
        c_fusion = int(ctx[ctx_first].shape[0])
        params = load_torch_rife_hd_legacy(model_dir, version)
        return ZooInterpolator(
            f"hdv{version}",
            RIFEHDLegacy(version=version, c_fusion=c_fusion, cs=cs),
            params, pad_multiple=64)
    from opticalflowscivis_tpu.models.ifnet_hd import (
        IFNetHDv3,
        load_torch_rife_hdv3,
    )

    params = load_torch_rife_hdv3(os.path.join(model_dir, "flownet.pkl"))
    return ZooInterpolator("hdv3", IFNetHDv3(), params, pad_multiple=32)
