"""IFNet-HDv3 — the upstream RIFE v3.6 model-zoo architecture + weight import.

Parity with ``Flow-2D/train_log/IFNet_HDv3.py`` / ``RIFE_HDv3.py`` (used by the
pretrained-checkpoint path of ``inference_img.py:25-40`` and
``inference_video.py:83-98``):

- all four blocks are c=90 with 7+4-channel inputs (IFNet_HDv3.py:76-79);
- symmetric bidirectional refinement: each block runs twice with swapped inputs
  and the two predictions are averaged with the second's flow halves swapped and
  mask negated (IFNet_HDv3.py:100-104);
- RGB inputs; flow starts at zero instead of a first 2-channel block.

``load_torch_rife_hdv3`` converts an upstream ``flownet.pkl`` torch state_dict
into this module's params (torch is available CPU-only in this image; the
import is gated).  Conv kernels transpose OIHW→HWIO; ConvTranspose kernels
additionally flip spatial taps to match XLA transposed-conv semantics.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from opticalflowscivis_tpu.models.layers import ConvPReLU, DeconvPReLU, ResConvBlock
from opticalflowscivis_tpu.ops import backward_warp, resize_flow, resize_spatial


class IFBlockHD(nn.Module):
    """HDv3 block: like IFBlock but flow is always an input (no None branch)."""

    c: int = 90
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, flow: jax.Array, scale: int):
        full_spatial = x.shape[1:-1]
        if scale != 1:
            small = tuple(s // scale for s in full_spatial)
            x = resize_spatial(x, small)
            flow = resize_flow(flow, small)
        feat = jnp.concatenate([x, flow.astype(x.dtype)], axis=-1)
        feat = ConvPReLU(self.c // 2, 2, stride=2, dtype=self.dtype)(feat)
        feat = ConvPReLU(self.c, 2, stride=2, dtype=self.dtype)(feat)
        for _ in range(4):
            feat = ResConvBlock(self.c, 2, dtype=self.dtype)(feat)
        f = DeconvPReLU(self.c // 2, 2, dtype=self.dtype)(feat)
        f = nn.ConvTranspose(4, kernel_size=(4, 4), strides=(2, 2),
                             padding="SAME", dtype=self.dtype)(f)
        m = DeconvPReLU(self.c // 2, 2, dtype=self.dtype)(feat)
        m = nn.ConvTranspose(1, kernel_size=(4, 4), strides=(2, 2),
                             padding="SAME", dtype=self.dtype)(m)
        if scale != 1:
            f = resize_flow(f, full_spatial)
            m = resize_spatial(m, full_spatial)
        return f, m


def _swap_flow(flow: jax.Array) -> jax.Array:
    return jnp.concatenate([flow[..., 2:4], flow[..., :2]], axis=-1)


class IFNetHDv3(nn.Module):
    """Upstream RIFE v3.6 inference network (student-only)."""

    dtype: Any = None
    scales: tuple[int, ...] = (4, 2, 1)
    c: int = 90

    @nn.compact
    def __call__(self, img0: jax.Array, img1: jax.Array):
        compute = img0.dtype if self.dtype is None else self.dtype
        img0 = img0.astype(compute)
        img1 = img1.astype(compute)
        b = img0.shape[0]
        spatial = img0.shape[1:-1]
        flow = jnp.zeros((b,) + spatial + (4,), jnp.float32)
        mask = jnp.zeros((b,) + spatial + (1,), compute)
        warped0, warped1 = img0, img1
        flow_list, mask_list, merged = [], [], []
        blocks = [IFBlockHD(self.c, dtype=self.dtype, name=f"block{i}") for i in range(3)]
        for i in range(3):
            f0, m0 = blocks[i](
                jnp.concatenate([warped0[..., :3], warped1[..., :3], mask], -1),
                flow, self.scales[i],
            )
            f1, m1 = blocks[i](
                jnp.concatenate([warped1[..., :3], warped0[..., :3], -mask], -1),
                _swap_flow(flow), self.scales[i],
            )
            flow = flow + (f0.astype(jnp.float32) + _swap_flow(f1).astype(jnp.float32)) / 2
            mask = mask + (m0 - m1) / 2
            flow_list.append(flow)
            mask_list.append(mask)
            warped0 = backward_warp(img0, flow[..., :2])
            warped1 = backward_warp(img1, flow[..., 2:4])
            merged.append((warped0, warped1))
        out = []
        for i in range(3):
            s = jax.nn.sigmoid(mask_list[i])
            out.append(merged[i][0] * s + merged[i][1] * (1 - s))
        return {"flow_list": flow_list, "mask": jax.nn.sigmoid(mask_list[-1]),
                "merged": out}


# ---- torch checkpoint import -------------------------------------------------

_SEQ_MAP = {  # torch submodule path fragments → flax module names
    "conv0.0.0": "ConvPReLU_0/Conv_0", "conv0.0.1": "ConvPReLU_0/PReLU_0",
    "conv0.1.0": "ConvPReLU_1/Conv_0", "conv0.1.1": "ConvPReLU_1/PReLU_0",
    "conv1.0": "DeconvPReLU_0/ConvTranspose_0", "conv1.1": "DeconvPReLU_0/PReLU_0",
    "conv1.2": "ConvTranspose_0",
    "conv2.0": "DeconvPReLU_1/ConvTranspose_0", "conv2.1": "DeconvPReLU_1/PReLU_0",
    "conv2.2": "ConvTranspose_1",
}
for _blk in range(4):
    for _cv in range(2):
        _SEQ_MAP[f"convblock{_blk}.{_cv}.0"] = (
            f"ResConvBlock_{_blk}/ConvPReLU_{_cv}/Conv_0"
        )
        _SEQ_MAP[f"convblock{_blk}.{_cv}.1"] = (
            f"ResConvBlock_{_blk}/ConvPReLU_{_cv}/PReLU_0"
        )


_FLOW_PERM = (1, 0, 3, 2)  # torch (u0,v0,u1,v1) → row-major (v0,u0,v1,u1)


def _permute_flow_channels(params: dict) -> dict:
    """Reparameterize each block so its flow tensors are row-major (dy,dx).

    Torch RIFE flow channels are (dx,dy) pairs (grid_sample x-first,
    IFNet_HDv3.py warp calls), while this repo's ``backward_warp`` reads
    ``flow[..., i]`` as displacement along spatial axis i.  Swapping (a) the
    output channels of every flow head and (b) the flow-slice input channels of
    every conv that consumes flow is an exact reparameterization: the network
    computes identical values with flow carried in (dy,dx) order, so warps and
    per-axis ``resize_flow`` rescales are correct.
    """
    for name, block in params.items():
        if not name.startswith("block"):
            continue
        # conv0's first conv sees [x(7ch) | flow(4ch)] → permute input rows 7..10
        k = block["ConvPReLU_0"]["Conv_0"]["kernel"]
        in_perm = list(range(k.shape[2]))
        in_perm[-4:] = [in_perm[-4 + i] for i in _FLOW_PERM]
        block["ConvPReLU_0"]["Conv_0"]["kernel"] = k[:, :, jnp.asarray(in_perm), :]
        # flow head (conv1's final ConvTranspose, 4ch out) → permute outputs
        head = block["ConvTranspose_0"]
        head["kernel"] = head["kernel"][..., jnp.asarray(_FLOW_PERM)]
        head["bias"] = head["bias"][jnp.asarray(_FLOW_PERM)]
    return params


def load_torch_rife_hdv3(path: str) -> dict:
    """Convert an upstream RIFE v3.6 ``flownet.pkl`` into IFNetHDv3 params.

    Strips DDP ``module.`` prefixes (RIFE_HDv3.py:49-54).  The teacher block
    (``block_tea``) in the checkpoint is dropped — HDv3 inference never uses it.
    Flow channels are converted to this repo's row-major (dy,dx) convention —
    see ``_permute_flow_channels``.
    """
    import torch

    state = torch.load(path, map_location="cpu")
    params: dict = {}
    for key, tensor in state.items():
        key = key.replace("module.", "")
        parts = key.split(".")
        block = parts[0]
        if block == "block_tea":
            continue
        rest = ".".join(parts[1:-1])
        leaf = parts[-1]  # weight | bias
        if rest not in _SEQ_MAP:
            raise KeyError(f"unmapped torch key {key}")
        flax_path = f"{block}/{_SEQ_MAP[rest]}".split("/")
        arr = np.asarray(tensor.detach().numpy(), np.float32)
        is_transpose = "ConvTranspose" in flax_path[-1]
        if leaf == "weight" and arr.ndim == 4:
            if is_transpose:
                # torch IOHW, taps flipped vs XLA transposed conv → HWIO + flip
                arr = np.flip(arr.transpose(2, 3, 0, 1), axis=(0, 1)).copy()
            else:
                arr = arr.transpose(2, 3, 1, 0)  # OIHW → HWIO
            name = "kernel"
        elif leaf == "bias":
            name = "bias"
        else:  # PReLU weight [C]
            name = "slope"
            flax_path = flax_path  # PReLU module path already set
        node = params
        for p in flax_path:
            node = node.setdefault(p, {})
        node[name] = jnp.asarray(arr)
    return {"params": _permute_flow_channels(params)}
