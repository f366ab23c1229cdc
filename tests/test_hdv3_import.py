"""HDv3 torch-checkpoint import parity — converted params must reproduce the
torch network's outputs (torch is CPU-only in this image).

The torch harness below re-types the upstream RIFE v3.6 block structure
(IFNet_HDv3.py) minimally so a random state_dict can be generated and both
implementations compared on the same input.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from opticalflowscivis_tpu.models.ifnet_hd import IFNetHDv3, load_torch_rife_hdv3  # noqa: E402


def _tconv(i, o, k=3, s=1, p=1):
    return tnn.Sequential(tnn.Conv2d(i, o, k, s, p), tnn.PReLU(o))


class _TorchIFBlock(tnn.Module):
    def __init__(self, in_planes, c=90):
        super().__init__()
        self.conv0 = tnn.Sequential(_tconv(in_planes, c // 2, 3, 2, 1),
                                    _tconv(c // 2, c, 3, 2, 1))
        for b in range(4):
            setattr(self, f"convblock{b}",
                    tnn.Sequential(_tconv(c, c), _tconv(c, c)))
        self.conv1 = tnn.Sequential(tnn.ConvTranspose2d(c, c // 2, 4, 2, 1),
                                    tnn.PReLU(c // 2),
                                    tnn.ConvTranspose2d(c // 2, 4, 4, 2, 1))
        self.conv2 = tnn.Sequential(tnn.ConvTranspose2d(c, c // 2, 4, 2, 1),
                                    tnn.PReLU(c // 2),
                                    tnn.ConvTranspose2d(c // 2, 1, 4, 2, 1))

    def forward(self, x, flow, scale=1):
        if scale != 1:
            x = tF.interpolate(x, scale_factor=1.0 / scale, mode="bilinear",
                               align_corners=False)
            flow = tF.interpolate(flow, scale_factor=1.0 / scale, mode="bilinear",
                                  align_corners=False) / scale
        feat = self.conv0(torch.cat((x, flow), 1))
        for b in range(4):
            feat = getattr(self, f"convblock{b}")(feat) + feat
        f = self.conv1(feat)
        m = self.conv2(feat)
        if scale != 1:
            f = tF.interpolate(f, scale_factor=scale, mode="bilinear",
                               align_corners=False) * scale
            m = tF.interpolate(m, scale_factor=scale, mode="bilinear",
                               align_corners=False)
        return f, m


def test_block_forward_parity(tmp_path):
    """One converted HDv3 block must match torch to float tolerance."""
    torch.manual_seed(0)
    tb = _TorchIFBlock(11, c=12).eval()
    state = {f"block0.{k}": v for k, v in tb.state_dict().items()}
    # converter needs all 3 student blocks present; clone block0's weights
    for b in (1, 2):
        state.update({f"block{b}.{k}": v.clone() for k, v in tb.state_dict().items()})
    path = str(tmp_path / "flownet.pkl")
    torch.save(state, path)

    params = load_torch_rife_hdv3(path)

    x_np = np.random.default_rng(0).normal(size=(1, 7, 32, 32)).astype(np.float32)
    fl_np = np.random.default_rng(1).normal(size=(1, 4, 32, 32)).astype(np.float32)
    with torch.no_grad():
        tf_flow, tf_mask = tb(torch.from_numpy(x_np), torch.from_numpy(fl_np),
                              scale=1)

    from opticalflowscivis_tpu.models.ifnet_hd import IFBlockHD

    fb = IFBlockHD(c=12)
    fparams = {"params": params["params"]["block0"]}
    x_j = jnp.asarray(x_np.transpose(0, 2, 3, 1))
    # the converter reparameterizes flow channels from torch (u,v) x-first order
    # to this repo's row-major (dy,dx): feed permuted flow, expect permuted flow.
    perm = [1, 0, 3, 2]
    fl_j = jnp.asarray(fl_np.transpose(0, 2, 3, 1))[..., perm]
    ff, fm = fb.apply(fparams, x_j, fl_j, 1)
    np.testing.assert_allclose(
        np.asarray(ff[..., perm]).transpose(0, 3, 1, 2), tf_flow.numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(fm).transpose(0, 3, 1, 2), tf_mask.numpy(), atol=2e-4
    )


def _torch_warp(img, flow):
    """grid_sample border/align_corners=True warp, torch (dx,dy) flow channels."""
    _, _, H, W = img.shape
    gy, gx = torch.meshgrid(
        torch.arange(H, dtype=torch.float32),
        torch.arange(W, dtype=torch.float32), indexing="ij")
    x = gx[None] + flow[:, 0]
    y = gy[None] + flow[:, 1]
    grid = torch.stack([2 * x / (W - 1) - 1, 2 * y / (H - 1) - 1], dim=-1)
    return tF.grid_sample(img, grid, mode="bilinear", padding_mode="border",
                          align_corners=True)


class _TorchIFNetHDv3(tnn.Module):
    """Minimal re-typing of the upstream v3.6 forward (IFNet_HDv3.py:84-110)."""

    def __init__(self, c=12):
        super().__init__()
        for b in range(3):
            setattr(self, f"block{b}", _TorchIFBlock(11, c=c))

    def forward(self, img0, img1, scales=(4, 2, 1)):
        flow = torch.zeros(img0.shape[0], 4, *img0.shape[2:])
        mask = torch.zeros(img0.shape[0], 1, *img0.shape[2:])
        w0, w1 = img0, img1
        for i in range(3):
            blk = getattr(self, f"block{i}")
            f0, m0 = blk(torch.cat((w0, w1, mask), 1), flow, scales[i])
            f1, m1 = blk(torch.cat((w1, w0, -mask), 1),
                         torch.cat((flow[:, 2:4], flow[:, :2]), 1), scales[i])
            flow = flow + (f0 + torch.cat((f1[:, 2:4], f1[:, :2]), 1)) / 2
            mask = mask + (m0 + (-m1)) / 2
            w0 = _torch_warp(img0, flow[:, :2])
            w1 = _torch_warp(img1, flow[:, 2:4])
        s = torch.sigmoid(mask)
        return flow, w0 * s + w1 * (1 - s)


def test_full_network_forward_parity(tmp_path):
    """Converted full net (warps + multi-scale resizes included) matches torch."""
    torch.manual_seed(7)
    tnet = _TorchIFNetHDv3(c=12).eval()
    path = str(tmp_path / "flownet.pkl")
    torch.save(tnet.state_dict(), path)
    params = load_torch_rife_hdv3(path)

    rng = np.random.default_rng(3)
    i0 = rng.uniform(size=(2, 3, 32, 48)).astype(np.float32)
    i1 = rng.uniform(size=(2, 3, 32, 48)).astype(np.float32)
    with torch.no_grad():
        t_flow, t_merged = tnet(torch.from_numpy(i0), torch.from_numpy(i1))

    net = IFNetHDv3(c=12)
    out = net.apply(params, jnp.asarray(i0.transpose(0, 2, 3, 1)),
                    jnp.asarray(i1.transpose(0, 2, 3, 1)))
    perm = [1, 0, 3, 2]
    np.testing.assert_allclose(
        np.asarray(out["flow_list"][-1][..., perm]).transpose(0, 3, 1, 2),
        t_flow.numpy(), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(out["merged"][-1]).transpose(0, 3, 1, 2),
        t_merged.numpy(), atol=5e-4)


def test_full_network_structure_roundtrip(tmp_path):
    """Converted tree must slot into IFNetHDv3.init's structure exactly."""
    torch.manual_seed(1)
    state = {}
    for b in range(3):
        blk = _TorchIFBlock(11, c=12)
        state.update({f"block{b}.{k}": v for k, v in blk.state_dict().items()})
    state.update(
        {f"block_tea.{k}": v for k, v in _TorchIFBlock(14, c=12).state_dict().items()}
    )
    path = str(tmp_path / "flownet.pkl")
    torch.save(state, path)
    converted = load_torch_rife_hdv3(path)

    # structure vs a freshly-initialized (c=12) network of the same shape
    import flax.linen as fnn

    class Tiny(IFNetHDv3):
        @fnn.compact
        def __call__(self, img0, img1):  # same wiring, c=12 blocks
            from opticalflowscivis_tpu.models.ifnet_hd import IFBlockHD, _swap_flow

            flow = jnp.zeros(img0.shape[:-1] + (4,), jnp.float32)
            mask = jnp.zeros(img0.shape[:-1] + (1,), img0.dtype)
            w0, w1 = img0, img1
            blocks = [IFBlockHD(12, name=f"block{i}") for i in range(3)]
            for i in range(3):
                f0, m0 = blocks[i](
                    jnp.concatenate([w0[..., :3], w1[..., :3], mask], -1), flow, 1)
                flow = flow + f0
                mask = mask + m0
            return flow

    net = Tiny()
    x = jnp.zeros((1, 32, 32, 3))
    ref_params = net.init(jax.random.PRNGKey(0), x, x)
    ref_struct = jax.tree_util.tree_structure(ref_params["params"])
    conv_struct = jax.tree_util.tree_structure(
        {k: v for k, v in converted["params"].items() if k != "block_tea"}
    )
    assert ref_struct == conv_struct
