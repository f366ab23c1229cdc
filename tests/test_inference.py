"""Inference engine tests — padding, recursion, series reconstruction, gates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opticalflowscivis_tpu.inference import (
    Interpolator,
    batched_pair_inference,
    interpolate_ratio,
    interpolate_recursive,
    interpolate_series,
)
from opticalflowscivis_tpu.models import IFNet


@pytest.fixture(scope="module")
def interp():
    net = IFNet(ndim=2, block_channels=(8, 8, 8), teacher_channels=8)
    x = jnp.zeros((1, 32, 32, 1))
    params = net.init(jax.random.PRNGKey(0), x, x, None)
    return Interpolator(net, params, pad_multiple=32)


def test_pair_pads_odd_sizes(interp):
    rng = np.random.default_rng(0)
    img0 = rng.uniform(0, 1, (1, 30, 45, 1)).astype(np.float32)
    img1 = rng.uniform(0, 1, (1, 30, 45, 1)).astype(np.float32)
    pred, flow, mask = interp.pair(img0, img1)
    assert pred.shape == (1, 30, 45, 1)
    assert flow.shape == (1, 30, 45, 4)
    assert mask.shape == (1, 30, 45, 1)


def test_recursive_counts(interp):
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32)
    b = rng.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32)
    for n in (1, 3, 7):
        mids = interpolate_recursive(interp, a, b, n)
        assert len(mids) == n


def test_series_reconstruction_length(interp):
    rng = np.random.default_rng(2)
    frames = rng.uniform(0, 1, (9, 32, 32, 1)).astype(np.float32)
    recon, flows = interpolate_series(interp, frames, factor=4, collect_flow=True)
    assert recon.shape[0] == 9  # (9//4 - 1)*4 + ... kept frames at 0,4,8
    np.testing.assert_allclose(recon[0], frames[0])
    np.testing.assert_allclose(recon[4], frames[4])
    np.testing.assert_allclose(recon[8], frames[8])
    assert flows is not None and flows.shape[0] == 2


def test_series_device_path_matches_sequential(interp):
    """The device-resident batched path must reproduce the recursive-midpoint
    reconstruction exactly (same bisection tree, same forwards)."""
    from opticalflowscivis_tpu.inference import interpolate_series_device

    rng = np.random.default_rng(7)
    frames = rng.uniform(0, 1, (9, 30, 45, 1)).astype(np.float32)
    recon_dev, flows_dev = interpolate_series_device(
        interp, frames, factor=4, collect_flow=True
    )
    # sequential oracle: pad ONCE, recurse on padded frames, crop at the end —
    # the reference's make_inference semantics (inference_img.py:56-61 pads
    # before the bisection loop and only crops at write time)
    padded, _ = interp._pad(frames)
    kept = padded[::4]
    out = []
    for a, b in zip(kept[:-1], kept[1:]):
        out.append(a)
        out.extend(m[0] for m in interpolate_recursive(interp, a[None], b[None], 3))
    out.append(kept[-1])
    oracle = np.stack(out)[:, :30, :45]
    np.testing.assert_allclose(recon_dev, oracle, atol=2e-5)
    assert flows_dev is not None and flows_dev.shape == (2, 30, 45, 4)


def test_series_dup_gate_copies(interp):
    frames = np.tile(
        np.random.default_rng(3).uniform(0, 1, (1, 32, 32, 1)).astype(np.float32),
        (5, 1, 1, 1),
    )
    recon, _ = interpolate_series(interp, frames, factor=2, dup_ssim_gate=0.996)
    np.testing.assert_allclose(recon, frames[: recon.shape[0]])


def test_interpolate_ratio_endpoints(interp):
    rng = np.random.default_rng(4)
    a = rng.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32)
    b = rng.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32)
    np.testing.assert_allclose(interpolate_ratio(interp, a, b, 0.01), a)
    np.testing.assert_allclose(interpolate_ratio(interp, a, b, 0.99), b)
    mid = interpolate_ratio(interp, a, b, 0.5)
    assert mid.shape == a.shape


def test_batched_pair_inference(interp):
    rng = np.random.default_rng(5)
    tuples = rng.uniform(0, 1, (5, 3, 32, 32, 1)).astype(np.float32)
    res = batched_pair_inference(interp, tuples, batch_size=2)
    assert res["pred"].shape == (5, 32, 32, 1)
    assert res["flow"].shape == (5, 32, 32, 4)
    np.testing.assert_allclose(res["gt"], tuples[:, 2])


def test_tta_matches_manual_flip_average(interp):
    """TTA (flip-averaged inference, RIFE.py:66-78) must equal the manual
    composition (f(a,b) + unflip(f(flip(a), flip(b)))) / 2 of the plain
    interpolator.  (Conv nets are not flip-equivariant, so TTA != plain even
    on flip-symmetric inputs — the averaging is the point.)"""
    rng = np.random.default_rng(6)
    a = rng.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32)
    b = rng.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32)
    tta = Interpolator(interp.model, interp.params, pad_multiple=32, tta=True)
    p_plain, _, _ = interp.pair(a, b)
    p_flip, _, _ = interp.pair(a[:, ::-1, ::-1].copy(), b[:, ::-1, ::-1].copy())
    expected = (p_plain + p_flip[:, ::-1, ::-1]) / 2
    p_tta, _, _ = tta.pair(a, b)
    np.testing.assert_allclose(p_tta, expected, atol=1e-5)


def test_tta_differs_on_asymmetric_input(interp):
    rng = np.random.default_rng(7)
    a = rng.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32)
    b = np.roll(a, 3, axis=2)
    tta = Interpolator(interp.model, interp.params, pad_multiple=32, tta=True)
    p_plain, f_plain, _ = interp.pair(a, b)
    p_tta, f_tta, _ = tta.pair(a, b)
    assert p_tta.shape == p_plain.shape
    # flow/mask come from the primary pass — identical by construction
    np.testing.assert_allclose(f_tta, f_plain, atol=1e-6)
    assert not np.allclose(p_tta, p_plain, atol=1e-6)
