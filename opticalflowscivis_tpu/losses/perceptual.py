"""VGG19 perceptual loss — parity with Flow-2D/model/loss.py:83-121.

The reference's ``VGGPerceptualLoss`` is present-but-unused in its main path
(instantiated nowhere in train.py); it is ported here for surface completeness:
ImageNet mean/std normalization (``MeanShift``, loss.py:83-96), the torchvision
``vgg19().features`` stack applied layer-by-layer to index 29, and L1 feature
distances after relu1_1 / relu2_1 / relu3_1 / relu4_1 / relu5_1 with weights
``[1/2.6, 1/4.8, 1/3.7, 1/5.6, 10/1.5]`` and the global 0.1 factor
(loss.py:108-120).  ``Y`` features are treated as constants
(``Y.detach()``) via ``lax.stop_gradient``.

Pretrained weights cannot be downloaded in this environment; use
``params_from_torch_state_dict`` with a locally available torchvision vgg19
checkpoint, or ``init_params(rng)`` for random (architecture-only) use in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg19 "features" conv plan: channels per conv, "M" = maxpool.
# Only the prefix up to layer index 29 (relu5_1) participates in the loss.
_VGG19_PLAN = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
               512, 512, 512, 512, "M", 512)  # last conv = conv5_1 (idx 28)

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# After which conv (0-based, counting convs only) a tapped ReLU sits:
# torchvision indices (i+1) in [2,7,12,21,30] → relu after convs 0,2,4,8,12.
_TAP_AFTER_CONV = (0, 2, 4, 8, 12)
_TAP_WEIGHTS = (1.0 / 2.6, 1.0 / 4.8, 1.0 / 3.7, 1.0 / 5.6, 10.0 / 1.5)


def init_params(rng: jax.Array, dtype=jnp.float32) -> list[dict]:
    """Random conv params for the tapped VGG19 prefix (tests / no-weights use)."""
    params = []
    c_in = 3
    for c in _VGG19_PLAN:
        if c == "M":
            continue
        rng, k = jax.random.split(rng)
        params.append({
            "w": jax.random.normal(k, (3, 3, c_in, c), dtype) *
                 jnp.sqrt(2.0 / (9 * c_in)),
            "b": jnp.zeros((c,), dtype),
        })
        c_in = c
    return params


def params_from_torch_state_dict(sd) -> list[dict]:
    """Convert torchvision ``vgg19().features.state_dict()`` (or a full vgg19
    state dict with ``features.`` prefixes) to this module's param list."""
    def get(name):
        for key in (name, f"features.{name}"):
            if key in sd:
                return np.asarray(sd[key].detach().cpu().numpy()
                                  if hasattr(sd[key], "detach") else sd[key])
        raise KeyError(name)

    # conv layer indices inside torchvision vgg19.features
    conv_idx = []
    i = 0
    for c in _VGG19_PLAN:
        if c == "M":
            i += 1
            continue
        conv_idx.append(i)
        i += 2  # conv + relu
    params = []
    for li in conv_idx:
        w = get(f"{li}.weight")  # [out, in, kh, kw]
        b = get(f"{li}.bias")
        params.append({"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
                       "b": jnp.asarray(b)})
    return params


def _features(params: list[dict], x: jax.Array) -> list[jax.Array]:
    """Run the VGG19 prefix on NHWC ``x``; return the tapped activations."""
    taps = []
    conv_i = 0
    for c in _VGG19_PLAN:
        if c == "M":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max,
                (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
            )
            continue
        p = params[conv_i]
        x = jax.lax.conv_general_dilated(
            x, p["w"].astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["b"].astype(x.dtype)
        x = jax.nn.relu(x)
        if conv_i in _TAP_AFTER_CONV:
            taps.append(x)
            if conv_i == _TAP_AFTER_CONV[-1]:
                break
        conv_i += 1
    return taps


def vgg_perceptual_loss(params: list[dict], x: jax.Array, y: jax.Array) -> jax.Array:
    """L1 feature-distance loss (loss.py:108-120).  ``x, y``: NHWC in [0,1];
    single-channel inputs are tiled to RGB (the SciVis fields are grayscale)."""
    if x.shape[-1] == 1:
        x = jnp.tile(x, (1,) * (x.ndim - 1) + (3,))
        y = jnp.tile(y, (1,) * (y.ndim - 1) + (3,))
    mean = jnp.asarray(_IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(_IMAGENET_STD, x.dtype)
    fx = _features(params, (x - mean) / std)
    fy = _features(params, (jax.lax.stop_gradient(y) - mean) / std)
    loss = 0.0
    for w, a, b in zip(_TAP_WEIGHTS, fx, fy):
        loss += w * jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b))) * 0.1
    return loss
