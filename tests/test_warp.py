"""Unit tests for ops.warp — property tests against a numpy oracle.

Strategy per SURVEY.md §4: identity flow -> identity; constant shift -> translate;
fractional flow vs a hand-rolled numpy multilinear oracle; border vs zeros padding.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from opticalflowscivis_tpu.ops import backward_warp


def np_warp_oracle(img, flow, padding="border"):
    """Naive per-pixel multilinear sampler. img [B,*S,C], flow [B,*S,ndim]."""
    b = img.shape[0]
    spatial = img.shape[1:-1]
    c = img.shape[-1]
    ndim = len(spatial)
    out = np.zeros_like(img, dtype=np.float64)
    for bi in range(b):
        for p in np.ndindex(*spatial):
            coords = [p[i] + flow[(bi, *p, i)] for i in range(ndim)]
            acc = np.zeros(c)
            for corner in np.ndindex(*([2] * ndim)):
                w = 1.0
                idx = []
                inb = True
                for i in range(ndim):
                    lo = np.floor(coords[i])
                    fr = coords[i] - lo
                    j = int(lo) + corner[i]
                    w *= fr if corner[i] else (1.0 - fr)
                    if j < 0 or j > spatial[i] - 1:
                        inb = False
                        j = min(max(j, 0), spatial[i] - 1)
                    idx.append(j)
                if padding == "zeros" and not inb:
                    continue
                acc += w * img[(bi, *idx)]
            out[(bi, *p)] = acc
    return out


def test_identity_flow_2d():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 8, 12, 3)).astype(np.float32)
    flow = np.zeros((2, 8, 12, 2), np.float32)
    out = backward_warp(jnp.asarray(img), jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-6)


def test_integer_shift_2d():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 6, 6, 1)).astype(np.float32)
    # flow (dy=0, dx=+1): output(p) = img(p + d) -> shift content left.
    flow = np.zeros((1, 6, 6, 2), np.float32)
    flow[..., 1] = 1.0
    out = np.asarray(backward_warp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out[0, :, :-1, 0], img[0, :, 1:, 0], atol=1e-6)
    # border padding clamps the last column
    np.testing.assert_allclose(out[0, :, -1, 0], img[0, :, -1, 0], atol=1e-6)


@pytest.mark.parametrize("padding", ["border", "zeros"])
def test_fractional_flow_matches_oracle_2d(padding):
    rng = np.random.default_rng(2)
    img = rng.normal(size=(2, 7, 9, 2)).astype(np.float32)
    flow = rng.uniform(-3, 3, size=(2, 7, 9, 2)).astype(np.float32)
    out = np.asarray(backward_warp(jnp.asarray(img), jnp.asarray(flow), padding=padding))
    ref = np_warp_oracle(img, flow, padding=padding)
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.parametrize("padding", ["border", "zeros"])
def test_fractional_flow_matches_oracle_3d(padding):
    rng = np.random.default_rng(3)
    img = rng.normal(size=(1, 5, 6, 7, 2)).astype(np.float32)
    flow = rng.uniform(-2, 2, size=(1, 5, 6, 7, 3)).astype(np.float32)
    out = np.asarray(backward_warp(jnp.asarray(img), jnp.asarray(flow), padding=padding))
    ref = np_warp_oracle(img, flow, padding=padding)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_validity_mask():
    img = np.ones((1, 4, 4, 1), np.float32)
    flow = np.zeros((1, 4, 4, 2), np.float32)
    flow[..., 1] = 10.0  # everything samples far out of range
    out, mask = backward_warp(
        jnp.asarray(img), jnp.asarray(flow), padding="zeros", return_mask=True
    )
    assert np.all(np.asarray(out) == 0)
    assert np.all(np.asarray(mask) == 0)
    out2, mask2 = backward_warp(
        jnp.asarray(img), jnp.zeros((1, 4, 4, 2)), padding="zeros", return_mask=True
    )
    np.testing.assert_allclose(np.asarray(mask2), 1.0, atol=1e-6)


def test_gradients_finite():
    import jax

    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.normal(size=(1, 8, 8, 1)).astype(np.float32))
    flow = jnp.asarray(rng.uniform(-1, 1, size=(1, 8, 8, 2)).astype(np.float32))

    def loss(f):
        return jnp.sum(backward_warp(img, f) ** 2)

    g = jax.grad(loss)(flow)
    assert np.all(np.isfinite(np.asarray(g)))


def test_slab_remat_taps_matches_values_and_grads():
    """remat_taps is a memory optimization only — identical values and grads."""
    import jax

    from opticalflowscivis_tpu.ops.warp import backward_warp3d_slab

    rng = np.random.default_rng(9)
    img = jnp.asarray(rng.uniform(0, 1, (1, 6, 8, 8, 1)).astype(np.float32))
    flow = jnp.asarray(rng.uniform(-2, 2, (1, 6, 8, 8, 3)).astype(np.float32))

    def loss(f, remat):
        return jnp.sum(backward_warp3d_slab(img, f, r_z=3, remat_taps=remat) ** 2)

    v0, g0 = jax.value_and_grad(lambda f: loss(f, False))(flow)
    v1, g1 = jax.value_and_grad(lambda f: loss(f, True))(flow)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-5, atol=1e-6)
