"""RIFE HD v1/v2 legacy-zoo torch-checkpoint import parity.

Re-types the upstream oldmodel architectures (Flow-2D/model/oldmodel/
{IFNet_HD,IFNet_HDv2,RIFE_HD,RIFE_HDv2}.py) minimally in torch so random
checkpoints can be generated and the converted flax pipeline compared
end-to-end (flownet + contextnet + fusionnet, warps and BN folding included).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from opticalflowscivis_tpu.models.ifnet_hd_legacy import (  # noqa: E402
    RIFEHDLegacy,
    load_torch_rife_hd_legacy,
)


def _twarp(img, flow):
    _, _, H, W = img.shape
    gy, gx = torch.meshgrid(
        torch.arange(H, dtype=torch.float32),
        torch.arange(W, dtype=torch.float32), indexing="ij")
    x = gx[None] + flow[:, 0]
    y = gy[None] + flow[:, 1]
    grid = torch.stack([2 * x / (W - 1) - 1, 2 * y / (H - 1) - 1], dim=-1)
    return tF.grid_sample(img, grid, mode="bilinear", padding_mode="border",
                          align_corners=True)


def _interp(x, factor):
    return tF.interpolate(x, scale_factor=factor, mode="bilinear",
                          align_corners=False)


# ---- torch re-typings -------------------------------------------------------

def _conv_bn(i, o, k=3, s=1, p=1):
    return tnn.Sequential(tnn.Conv2d(i, o, k, s, p, bias=False),
                          tnn.BatchNorm2d(o), tnn.PReLU(o))


def _conv_bn_wo(i, o, k=3, s=1, p=1):
    return tnn.Sequential(tnn.Conv2d(i, o, k, s, p, bias=False),
                          tnn.BatchNorm2d(o))


def _conv_b(i, o, k=3, s=1, p=1):
    return tnn.Sequential(tnn.Conv2d(i, o, k, s, p, bias=True), tnn.PReLU(o))


class _TResV1(tnn.Module):  # IFNet_HD.ResBlock (BN, k5)
    def __init__(self, i, o, stride=1):
        super().__init__()
        self.conv0 = (tnn.Identity() if i == o and stride == 1
                      else tnn.Conv2d(i, o, 3, stride, 1, bias=False))
        self.conv1 = _conv_bn(i, o, 5, stride, 2)
        self.conv2 = _conv_bn_wo(o, o, 3, 1, 1)
        self.relu1 = tnn.PReLU(1)
        self.relu2 = tnn.PReLU(o)
        self.fc1 = tnn.Conv2d(o, 16, 1, bias=False)
        self.fc2 = tnn.Conv2d(16, o, 1, bias=False)

    def forward(self, x):
        y = self.conv0(x)
        x = self.conv2(self.conv1(x))
        w = x.mean(3, True).mean(2, True)
        w = torch.sigmoid(self.fc2(self.relu1(self.fc1(w))))
        return self.relu2(x * w + y)


class _TResHD(tnn.Module):  # RIFE_HD.ResBlock (bias convs, k3)
    def __init__(self, i, o, stride=2):
        super().__init__()
        self.conv0 = (tnn.Identity() if i == o and stride == 1
                      else tnn.Conv2d(i, o, 3, stride, 1, bias=False))
        self.conv1 = _conv_b(i, o, 3, stride, 1)
        self.conv2 = tnn.Sequential(tnn.Conv2d(o, o, 3, 1, 1, bias=True))
        self.relu1 = tnn.PReLU(1)
        self.relu2 = tnn.PReLU(o)
        self.fc1 = tnn.Conv2d(o, 16, 1, bias=False)
        self.fc2 = tnn.Conv2d(16, o, 1, bias=False)

    forward = _TResV1.forward


class _TIFBlockV1(tnn.Module):
    def __init__(self, i, scale, c):
        super().__init__()
        self.scale = scale
        self.conv0 = _conv_bn(i, c, 5, 2, 2)
        for r in range(6):
            setattr(self, f"res{r}", _TResV1(c, c))
        self.conv1 = tnn.Conv2d(c, 8, 3, 1, 1)
        self.up = tnn.PixelShuffle(2)

    def forward(self, x):
        if self.scale != 1:
            x = _interp(x, 1.0 / self.scale)
        x = self.conv0(x)
        for r in range(6):
            x = getattr(self, f"res{r}")(x)
        flow = self.up(self.conv1(x))
        if self.scale != 1:
            flow = _interp(flow, self.scale)
        return flow


class _TIFNetV1(tnn.Module):
    def __init__(self, cs):
        super().__init__()
        self.block0 = _TIFBlockV1(6, 8, cs[0])
        self.block1 = _TIFBlockV1(8, 4, cs[1])
        self.block2 = _TIFBlockV1(8, 2, cs[2])
        self.block3 = _TIFBlockV1(8, 1, cs[3])

    def forward(self, x, scale=1.0):
        x = _interp(x, 0.5 * scale)
        flow0 = self.block0(x)
        F1 = flow0
        w0, w1 = _twarp(x[:, :3], F1), _twarp(x[:, 3:], -F1)
        flow1 = self.block1(torch.cat((w0, w1, F1), 1))
        F2 = flow0 + flow1
        w0, w1 = _twarp(x[:, :3], F2), _twarp(x[:, 3:], -F2)
        flow2 = self.block2(torch.cat((w0, w1, F2), 1))
        F3 = F2 + flow2
        w0, w1 = _twarp(x[:, :3], F3), _twarp(x[:, 3:], -F3)
        flow3 = self.block3(torch.cat((w0, w1, F3), 1))
        F4 = F3 + flow3
        if scale != 1.0:
            F4 = _interp(F4, 1.0 / scale) / scale
        return F4


class _TContextV1(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv0 = _conv_b(3, c, 3, 2, 1)
        self.conv1 = _TResHD(c, c)
        self.conv2 = _TResHD(c, 2 * c)
        self.conv3 = _TResHD(2 * c, 4 * c)
        self.conv4 = _TResHD(4 * c, 8 * c)

    def forward(self, x, flow):
        x = self.conv0(x)
        feats = []
        for i in range(1, 5):
            x = getattr(self, f"conv{i}")(x)
            flow = _interp(flow, 0.5) * 0.5
            feats.append(_twarp(x, flow))
        return feats


class _TFusionV1(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv0 = _conv_b(8, c, 3, 2, 1)
        self.down0 = _TResHD(c, 2 * c)
        self.down1 = _TResHD(4 * c, 4 * c)
        self.down2 = _TResHD(8 * c, 8 * c)
        self.down3 = _TResHD(16 * c, 16 * c)
        self.up0 = tnn.Sequential(tnn.ConvTranspose2d(32 * c, 8 * c, 4, 2, 1),
                                  tnn.PReLU(8 * c))
        self.up1 = tnn.Sequential(tnn.ConvTranspose2d(16 * c, 4 * c, 4, 2, 1),
                                  tnn.PReLU(4 * c))
        self.up2 = tnn.Sequential(tnn.ConvTranspose2d(8 * c, 2 * c, 4, 2, 1),
                                  tnn.PReLU(2 * c))
        self.up3 = tnn.Sequential(tnn.ConvTranspose2d(4 * c, c, 4, 2, 1),
                                  tnn.PReLU(c))
        self.conv = tnn.Conv2d(c, 16, 3, 1, 1)
        self.up4 = tnn.PixelShuffle(2)

    def forward(self, img0, img1, flow, c0, c1):
        w0, w1 = _twarp(img0, flow), _twarp(img1, -flow)
        x = self.conv0(torch.cat((w0, w1, flow), 1))
        s0 = self.down0(x)
        s1 = self.down1(torch.cat((s0, c0[0], c1[0]), 1))
        s2 = self.down2(torch.cat((s1, c0[1], c1[1]), 1))
        s3 = self.down3(torch.cat((s2, c0[2], c1[2]), 1))
        x = self.up0(torch.cat((s3, c0[3], c1[3]), 1))
        x = self.up1(torch.cat((x, s2), 1))
        x = self.up2(torch.cat((x, s1), 1))
        x = self.up3(torch.cat((x, s0), 1))
        return self.up4(self.conv(x)), w0, w1


class _TConv2(tnn.Module):
    def __init__(self, i, o, stride=2):
        super().__init__()
        self.conv1 = _conv_b(i, o, 3, stride, 1)
        self.conv2 = _conv_b(o, o, 3, 1, 1)

    def forward(self, x):
        return self.conv2(self.conv1(x))


class _TIFBlockV2(tnn.Module):
    def __init__(self, i, scale, c):
        super().__init__()
        self.scale = scale
        self.conv0 = tnn.Sequential(_conv_b(i, c, 3, 2, 1),
                                    _conv_b(c, 2 * c, 3, 2, 1))
        self.convblock = tnn.Sequential(*[_conv_b(2 * c, 2 * c) for _ in range(6)])
        self.conv1 = tnn.ConvTranspose2d(2 * c, 4, 4, 2, 1)

    def forward(self, x):
        if self.scale != 1:
            x = _interp(x, 1.0 / self.scale)
        x = self.conv1(self.convblock(self.conv0(x)))
        if self.scale != 1:
            x = _interp(x, self.scale)
        return x


class _TIFNetV2(tnn.Module):
    def __init__(self, cs):
        super().__init__()
        self.block0 = _TIFBlockV2(6, 8, cs[0])
        self.block1 = _TIFBlockV2(10, 4, cs[1])
        self.block2 = _TIFBlockV2(10, 2, cs[2])
        self.block3 = _TIFBlockV2(10, 1, cs[3])

    def forward(self, x, scale=1.0):
        if scale != 1.0:
            x = _interp(x, scale)
        flow = self.block0(x)
        for i in range(1, 4):
            large = _interp(flow, 2.0) * 2.0
            w0 = _twarp(x[:, :3], large[:, :2])
            w1 = _twarp(x[:, 3:], large[:, 2:4])
            flow = flow + getattr(self, f"block{i}")(
                torch.cat((w0, w1, large), 1))
        if scale != 1.0:
            flow = _interp(flow, 1.0 / scale) / scale
        return flow


class _TContextV2(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv0 = _TConv2(3, c)
        self.conv1 = _TConv2(c, c)
        self.conv2 = _TConv2(c, 2 * c)
        self.conv3 = _TConv2(2 * c, 4 * c)
        self.conv4 = _TConv2(4 * c, 8 * c)

    forward = _TContextV1.forward


class _TFusionV2(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv0 = _TConv2(10, c)
        self.down0 = _TConv2(c, 2 * c)
        self.down1 = _TConv2(4 * c, 4 * c)
        self.down2 = _TConv2(8 * c, 8 * c)
        self.down3 = _TConv2(16 * c, 16 * c)
        self.up0 = tnn.Sequential(tnn.ConvTranspose2d(32 * c, 8 * c, 4, 2, 1),
                                  tnn.PReLU(8 * c))
        self.up1 = tnn.Sequential(tnn.ConvTranspose2d(16 * c, 4 * c, 4, 2, 1),
                                  tnn.PReLU(4 * c))
        self.up2 = tnn.Sequential(tnn.ConvTranspose2d(8 * c, 2 * c, 4, 2, 1),
                                  tnn.PReLU(2 * c))
        self.up3 = tnn.Sequential(tnn.ConvTranspose2d(4 * c, c, 4, 2, 1),
                                  tnn.PReLU(c))
        self.conv = tnn.ConvTranspose2d(c, 4, 4, 2, 1)

    def forward(self, img0, img1, flow, c0, c1):
        w0, w1 = _twarp(img0, flow[:, :2]), _twarp(img1, flow[:, 2:4])
        x = self.conv0(torch.cat((w0, w1, flow), 1))
        s0 = self.down0(x)
        s1 = self.down1(torch.cat((s0, c0[0], c1[0]), 1))
        s2 = self.down2(torch.cat((s1, c0[1], c1[1]), 1))
        s3 = self.down3(torch.cat((s2, c0[2], c1[2]), 1))
        x = self.up0(torch.cat((s3, c0[3], c1[3]), 1))
        x = self.up1(torch.cat((x, s2), 1))
        x = self.up2(torch.cat((x, s1), 1))
        x = self.up3(torch.cat((x, s0), 1))
        return self.conv(x), w0, w1


def _randomize_bn(module):
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)


def _torch_predict(version, ctx, fus, img0, img1, flow):
    if version == 1:
        c0, c1 = ctx(img0, flow), ctx(img1, -flow)
    else:
        c0, c1 = ctx(img0, flow[:, :2]), ctx(img1, flow[:, 2:4])
    flow = _interp(flow, 2.0) * 2.0
    out, w0, w1 = fus(img0, img1, flow, c0, c1)
    res = torch.sigmoid(out[:, :3]) * 2 - 1
    mask = torch.sigmoid(out[:, 3:4])
    return torch.clamp(w0 * mask + w1 * (1 - mask) + res, 0, 1)


CS = (16, 12, 10, 8)
CF = 8


@pytest.mark.parametrize("version", [1, 2])
def test_legacy_pipeline_parity(tmp_path, version):
    torch.manual_seed(version)
    tflow = (_TIFNetV1 if version == 1 else _TIFNetV2)(CS)
    tctx = (_TContextV1 if version == 1 else _TContextV2)(CF)
    tfus = (_TFusionV1 if version == 1 else _TFusionV2)(CF)
    for m in (tflow, tctx, tfus):
        _randomize_bn(m)
        m.eval()
    torch.save(tflow.state_dict(), tmp_path / "flownet.pkl")
    torch.save(tctx.state_dict(), tmp_path / "contextnet.pkl")
    torch.save(tfus.state_dict(), tmp_path / "unet.pkl")

    params = load_torch_rife_hd_legacy(str(tmp_path), version)
    model = RIFEHDLegacy(version=version, c_fusion=CF, cs=CS)

    rng = np.random.default_rng(version)
    i0 = rng.uniform(size=(1, 3, 64, 64)).astype(np.float32)
    i1 = rng.uniform(size=(1, 3, 64, 64)).astype(np.float32)
    t0, t1 = torch.from_numpy(i0), torch.from_numpy(i1)
    with torch.no_grad():
        t_half_flow = tflow(torch.cat((t0, t1), 1))
        t_pred = _torch_predict(version, tctx, tfus, t0, t1, t_half_flow)

    pred, flow_full, _mask = model.inference(
        params, jnp.asarray(i0.transpose(0, 2, 3, 1)),
        jnp.asarray(i1.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(pred).transpose(0, 3, 1, 2),
                               t_pred.numpy(), atol=2e-3)
    # flow comparison (converted params carry flow as row-major (dy,dx))
    perm = [1, 0] if version == 1 else [1, 0, 3, 2]
    t_full = (_interp(t_half_flow, 2.0) * 2.0).numpy()
    np.testing.assert_allclose(
        np.asarray(flow_full[..., perm]).transpose(0, 3, 1, 2), t_full,
        atol=2e-3)


def test_load_pretrained_zoo_detects_and_runs(tmp_path):
    """The fallback-chain loader must detect a legacy trio dir, infer the
    architecture widths from the checkpoint, and interpolate single-channel
    frames (tiled to RGB and averaged back)."""
    from opticalflowscivis_tpu.inference import load_pretrained_zoo

    torch.manual_seed(5)
    tflow, tctx, tfus = _TIFNetV2(CS), _TContextV2(CF), _TFusionV2(CF)
    torch.save(tflow.state_dict(), tmp_path / "flownet.pkl")
    torch.save(tctx.state_dict(), tmp_path / "contextnet.pkl")
    torch.save(tfus.state_dict(), tmp_path / "unet.pkl")

    zoo = load_pretrained_zoo(str(tmp_path))
    assert zoo.kind == "hdv2"
    rng = np.random.default_rng(0)
    a = rng.uniform(size=(1, 60, 60, 1)).astype(np.float32)  # pads to 64
    b = rng.uniform(size=(1, 60, 60, 1)).astype(np.float32)
    pred, flow, mask = zoo.pair(a, b)
    assert pred.shape == (1, 60, 60, 1)
    assert flow.shape[1:3] == (60, 60)
    assert np.isfinite(pred).all()
    with pytest.raises(ValueError):
        zoo.pair(a, b, timestep=0.25)
