"""Aux subsystem tests: boundary-dilated warp, timestep selection, profiling."""

import numpy as np
import jax
import jax.numpy as jnp

from opticalflowscivis_tpu.evalsuite.selection import select_timesteps, selection_curve
from opticalflowscivis_tpu.ops import backward_warp, boundary_dilated_warp
from opticalflowscivis_tpu.utils import StepTimer


def test_boundary_dilated_warp_recovers_outside_crop():
    """Flow pointing outside the crop must hit real raw-image pixels."""
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32))
    start = jnp.asarray([[8.0, 8.0]])
    crop = raw[:, 8:24, 8:24]
    # flow = -6 rows: crop pixel (0,0) samples raw (2, 8) — outside the crop
    flow = jnp.full((1, 16, 16, 2), 0.0).at[..., 0].set(-6.0)
    warped = boundary_dilated_warp(raw, flow, start)
    expected = raw[:, 2:18, 8:24]
    np.testing.assert_allclose(np.asarray(warped), np.asarray(expected), atol=1e-6)
    # a plain border-clamped warp of the crop cannot recover those pixels
    clamped = backward_warp(crop, flow)
    assert float(jnp.abs(clamped - expected).max()) > 1e-3


def test_boundary_dilated_warp_zero_start_matches_backward_warp():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 1)).astype(np.float32))
    flow = jnp.asarray(rng.normal(0, 2, (2, 16, 16, 2)).astype(np.float32))
    a = boundary_dilated_warp(img, flow, jnp.zeros((2, 2)))
    b = backward_warp(img, flow, padding="border")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_select_timesteps():
    rng = np.random.default_rng(2)
    orig = rng.uniform(0, 255, (8, 8, 8)).astype(np.float32)
    interp = orig + rng.normal(0, 2.0, orig.shape).astype(np.float32)
    interp[3] += 80.0  # one badly-reconstructed frame
    selected, thr = select_timesteps(orig, interp, factor=2)
    assert selected == [3]


def test_selection_curve():
    frames = np.random.default_rng(3).uniform(0, 1, (9, 8, 8)).astype(np.float32)

    def linear(fr, factor):
        from opticalflowscivis_tpu.evalsuite import linear_interpolation_baseline

        return linear_interpolation_baseline(fr, factor)

    curve = selection_curve(frames, linear, factors=(2, 4), data_range=1.0)
    assert set(curve) == {2, 4}
    assert curve[2]["n_kept"] > curve[4]["n_kept"]


def test_step_timer():
    t = StepTimer(sample_every=2)
    assert t.tick() is None
    rate = t.tick(jnp.zeros(()))
    assert rate is not None and rate > 0
