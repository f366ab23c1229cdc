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
    # torch flow channels (u0,v0,u1,v1)=(x,y,...); our convention is row-major.
    # For a pure numerical-parity check we feed the raw channels and compare
    # the conv stacks only (the resize/rescale path is exercised at scale=1).
    fl_j = jnp.asarray(fl_np.transpose(0, 2, 3, 1))
    ff, fm = fb.apply(fparams, x_j, fl_j, 1)
    np.testing.assert_allclose(
        np.asarray(ff).transpose(0, 3, 1, 2), tf_flow.numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(fm).transpose(0, 3, 1, 2), tf_mask.numpy(), atol=2e-4
    )


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
