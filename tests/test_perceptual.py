"""VGG perceptual loss vs a torch oracle that replicates the reference loop
(Flow-2D/model/loss.py:98-120) on the same random weights."""

import numpy as np
import pytest

from opticalflowscivis_tpu.losses.perceptual import (
    init_params,
    params_from_torch_state_dict,
    vgg_perceptual_loss,
)

torch = pytest.importorskip("torch")


def _torch_vgg19_features():
    """torchvision vgg19().features layer layout (random init)."""
    import torch.nn as nn

    plan = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
            512, 512, 512, 512, "M", 512, 512, 512, 512, "M")
    layers, c_in = [], 3
    for c in plan:
        if c == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(c_in, c, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            c_in = c
    return nn.Sequential(*layers)


def _torch_reference_loss(feats, x, y):
    """The reference forward (loss.py:108-120) incl. MeanShift normalization."""
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    X, Y = (x - mean) / std, (y - mean) / std
    indices = [2, 7, 12, 21, 30]
    weights = [1.0 / 2.6, 1.0 / 4.8, 1.0 / 3.7, 1.0 / 5.6, 10 / 1.5]
    k, loss = 0, 0.0
    for i in range(indices[-1]):
        X = feats[i](X)
        Y = feats[i](Y)
        if (i + 1) in indices:
            loss = loss + weights[k] * (X - Y.detach()).abs().mean() * 0.1
            k += 1
    return float(loss)


def test_vgg_perceptual_matches_torch_oracle():
    torch.manual_seed(0)
    feats = _torch_vgg19_features().eval()
    params = params_from_torch_state_dict(feats.state_dict())
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(2, 3, 64, 64)).astype(np.float32)
    y = rng.uniform(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = _torch_reference_loss(feats, torch.from_numpy(x), torch.from_numpy(y))
    got = float(vgg_perceptual_loss(params,
                                    np.transpose(x, (0, 2, 3, 1)),
                                    np.transpose(y, (0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_vgg_perceptual_grayscale_and_grad():
    import jax

    params = init_params(jax.random.PRNGKey(0))
    x = np.random.default_rng(2).uniform(size=(1, 1, 64, 64)).astype(np.float32)
    x = np.transpose(x, (0, 2, 3, 1))
    loss, g = jax.value_and_grad(
        lambda a: vgg_perceptual_loss(params, a, jax.numpy.zeros_like(a))
    )(x)
    assert np.isfinite(float(loss)) and np.isfinite(np.asarray(g)).all()
    # identical inputs → zero loss
    assert float(vgg_perceptual_loss(params, x, x)) == 0.0
