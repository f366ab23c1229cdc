"""Fast-warp tests: slab-decomposed 3-D warp + MXU one-hot 2-D warp kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from opticalflowscivis_tpu.ops.pallas.warp import backward_warp_pallas, warp2d_pallas_supported
from opticalflowscivis_tpu.ops.warp import backward_warp, backward_warp3d_slab


@pytest.fixture(scope="module")
def vol_and_flow():
    k = jax.random.PRNGKey(0)
    vol = jax.random.uniform(k, (2, 12, 16, 20, 2), jnp.float32)
    flow = jnp.clip(
        jax.random.normal(jax.random.fold_in(k, 1), (2, 12, 16, 20, 3)) * 2,
        -3.5, 3.5,
    )
    return vol, flow


@pytest.mark.parametrize("padding", ["border", "zeros"])
def test_slab_warp_matches_gather(vol_and_flow, padding):
    vol, flow = vol_and_flow
    ref = backward_warp(vol, flow, padding=padding)
    out = backward_warp3d_slab(vol, flow, r_z=4, padding=padding)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


def test_slab_warp_grads_match(vol_and_flow):
    vol, flow = vol_and_flow
    gr = jax.grad(lambda v, f: jnp.sum(backward_warp(v, f) ** 2), (0, 1))(vol, flow)
    gs = jax.grad(lambda v, f: jnp.sum(backward_warp3d_slab(v, f, 4) ** 2), (0, 1))(
        vol, flow
    )
    np.testing.assert_allclose(np.asarray(gr[0]), np.asarray(gs[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gr[1]), np.asarray(gs[1]), atol=1e-4)


def test_slab_warp_clamps_out_of_range_z():
    """|flow_z| > r_z clamps to ±r_z (documented bounded-exactness domain)."""
    k = jax.random.PRNGKey(2)
    vol = jax.random.uniform(k, (1, 10, 8, 8, 1), jnp.float32)
    flow = jnp.zeros((1, 10, 8, 8, 3)).at[..., 0].set(6.0)  # beyond r_z=4
    out = backward_warp3d_slab(vol, flow, r_z=4)
    ref = backward_warp(vol, flow.at[..., 0].set(4.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("padding", ["border", "zeros"])
def test_pallas_warp2d_interpret_matches(padding):
    k = jax.random.PRNGKey(0)
    img = jax.random.uniform(k, (2, 16, 32, 1), jnp.float32)
    flow = jnp.clip(jax.random.normal(jax.random.fold_in(k, 1), (2, 16, 32, 2)) * 3,
                    -7.5, 7.5)
    ref = backward_warp(img, flow, padding=padding)
    with pltpu.force_tpu_interpret_mode():
        out = backward_warp_pallas(img, flow, 8, padding)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


def test_pallas_warp2d_grads_interpret():
    k = jax.random.PRNGKey(1)
    img = jax.random.uniform(k, (1, 16, 32, 1), jnp.float32)
    flow = jnp.clip(jax.random.normal(k, (1, 16, 32, 2)) * 2, -7.5, 7.5)
    gr = jax.grad(
        lambda im, fl: jnp.sum(backward_warp(im, fl, padding="border") ** 2), (0, 1)
    )(img, flow)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(
            lambda im, fl: jnp.sum(backward_warp_pallas(im, fl, 8, "border") ** 2),
            (0, 1),
        )(img, flow)
    np.testing.assert_allclose(np.asarray(gr[0]), np.asarray(gp[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gr[1]), np.asarray(gp[1]), atol=1e-4)


def test_pallas_warp2d_grads_zeros_interpret():
    """The fused zeros-mode VJP (border-kernel bwd + analytic validity
    adjoint, round 5) must match the exact gather formulation.  Flow kept
    off integer values: the validity weight is piecewise-linear with
    subgradient choices at integers, same as the oracle's own kinks."""
    k = jax.random.PRNGKey(3)
    img = jax.random.uniform(k, (1, 16, 32, 1), jnp.float32)
    flow = jnp.clip(jax.random.normal(k, (1, 16, 32, 2)) * 4, -7.3, 7.3) + 0.21
    gr = jax.grad(
        lambda im, fl: jnp.sum(backward_warp(im, fl, padding="zeros") ** 2), (0, 1)
    )(img, flow)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(
            lambda im, fl: jnp.sum(backward_warp_pallas(im, fl, 8, "zeros") ** 2),
            (0, 1),
        )(img, flow)
    np.testing.assert_allclose(np.asarray(gr[0]), np.asarray(gp[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gr[1]), np.asarray(gp[1]), atol=1e-4)


def test_pallas_warp_supported():
    assert warp2d_pallas_supported((4, 160, 224, 1))
    assert not warp2d_pallas_supported((1, 16, 16, 16, 1))


def test_pallas_min_hw_gate(monkeypatch):
    """Tiny planes (coarse pyramid levels) are gated off the Pallas path —
    they stall ~30-40 ms/launch on VMEM staging while XLA's gathers are
    microseconds (round-5 trace, Results/r5/trace_summary_r5.json); the
    threshold is env-tunable for A-B sweeps (scripts/upflow_step_ab.py)."""
    from opticalflowscivis_tpu.ops.pallas.correlation import (
        pallas_cost_volume_supported,
    )

    tiny_warp, tiny_corr = (16, 4, 13, 32), (16, 4, 13, 32)
    assert not warp2d_pallas_supported(tiny_warp)  # default gate = 1024
    assert not pallas_cost_volume_supported(tiny_corr, 4)
    monkeypatch.setenv("OFS_PALLAS_MIN_HW", "0")
    assert warp2d_pallas_supported(tiny_warp)
    assert pallas_cost_volume_supported(tiny_corr, 4)
    monkeypatch.setenv("OFS_PALLAS_MIN_HW", "1000000")
    assert not warp2d_pallas_supported((4, 160, 224, 1))
    assert not pallas_cost_volume_supported((4, 64, 208, 32), 4)


def test_ifnet3d_with_slab_warp_runs():
    from opticalflowscivis_tpu.models import IFNet

    net = IFNet(ndim=3, block_channels=(8, 8, 8), teacher_channels=8,
                bounded_warp_rz=4)
    x = jnp.zeros((1, 16, 16, 16, 1))
    params = net.init(jax.random.PRNGKey(0), x, x, x)
    out = net.apply(params, x, x, x)
    assert out["merged"][-1].shape == (1, 16, 16, 16, 1)
