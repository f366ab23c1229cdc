"""Data pipeline tests — generators (GT flow correctness), grouping, augmentation."""

import numpy as np
import jax.numpy as jnp

from opticalflowscivis_tpu.data import (
    flip_augment,
    group_tuples,
    minmax_normalize,
    pad_to_multiple,
    rectangle_2d,
    rectangle_3d,
    temporal_resample,
)
from opticalflowscivis_tpu.ops import backward_warp


def test_rectangle_2d_shapes_and_ranges():
    arr = rectangle_2d(n_frames=30, grid=(64, 64), box=(20, 28), seed=0)
    assert arr.shape == (30, 64, 64, 3)
    assert arr.dtype == np.float32
    d = arr[..., 0]
    assert 0.0 <= d.min() and d.max() <= 1.0
    assert np.abs(arr[..., 1:]).max() <= 6


def test_rectangle_gt_flow_warps_to_next_frame():
    """Backward-warping frame t+1 by frame t's GT flow must reproduce frame t.

    GT flow is the forward displacement pos[t+1]-pos[t]; under backward-warp
    semantics F_t→t+1 = +v, so warp(frame[t+1], +flow[t]) ≈ frame[t] away from
    newly-revealed background.
    """
    arr = rectangle_2d(n_frames=40, grid=(64, 64), box=(24, 24), seed=7)
    worst = 0.0
    for t in range(5, 15):
        frame_t = jnp.asarray(arr[t : t + 1, ..., :1])
        frame_n = jnp.asarray(arr[t + 1 : t + 2, ..., :1])
        flow = jnp.asarray(arr[t : t + 1, ..., 1:])
        warped = backward_warp(frame_n, flow)
        inside = np.asarray(arr[t, ..., 0] > 0)  # box footprint at t
        err = np.abs(np.asarray(warped[0, ..., 0]) - np.asarray(frame_t[0, ..., 0]))
        worst = max(worst, float(err[inside].mean()))
    assert worst < 1e-4, worst


def test_rectangle_3d():
    arr = rectangle_3d(n_frames=10, grid=(24, 24, 24), box=(8, 10, 6), seed=1)
    assert arr.shape == (10, 24, 24, 24, 4)
    assert arr[..., 0].max() == 1.0


def test_group_tuples_slot_order():
    t = np.arange(9, dtype=np.float32).reshape(9, 1, 1, 1)
    g1 = group_tuples(t, exp=1)  # (t, t+2, t+1)
    assert g1.shape[0] == 3 and g1.shape[1] == 3
    assert list(g1[0, :, 0, 0, 0]) == [0.0, 2.0, 1.0]
    g2 = group_tuples(np.arange(10, dtype=np.float32).reshape(10, 1, 1, 1), exp=2)
    assert g2.shape[1] == 5
    assert list(g2[0, :, 0, 0, 0]) == [0.0, 4.0, 1.0, 2.0, 3.0]


def test_temporal_resample():
    t = np.arange(9, dtype=np.float32).reshape(9, 1, 1, 1)
    r = temporal_resample(t, 3)
    assert list(r[:, 0, 0, 0]) == [0, 3, 6, 1, 4, 7, 2, 5, 8]


def test_flip_augment_negates_flow():
    arr = rectangle_2d(n_frames=6, grid=(32, 32), box=(10, 12), seed=2)
    out = flip_augment(arr)
    n = arr.shape[0]
    assert out.shape[0] == 4 * n
    # first flip is along spatial axis 0: density mirrored, flow dy negated
    np.testing.assert_allclose(out[n : 2 * n, ..., 0], arr[:, ::-1, :, 0])
    np.testing.assert_allclose(out[n : 2 * n, ..., 1], -arr[:, ::-1, :, 1])
    np.testing.assert_allclose(out[n : 2 * n, ..., 2], arr[:, ::-1, :, 2])


def test_pad_to_multiple():
    x = np.ones((4, 3, 30, 61, 1), np.float32)
    padded, pads = pad_to_multiple(x, 32, leading_axes=2)
    assert padded.shape == (4, 3, 32, 64, 1)
    assert pads[2] == (0, 2) and pads[3] == (0, 3)


def test_minmax_normalize_leaves_flow():
    arr = rectangle_2d(n_frames=6, grid=(32, 32), box=(10, 12), seed=3) * 7.0
    out = minmax_normalize(arr)
    assert out[..., 0].min() == 0.0 and out[..., 0].max() == 1.0
    np.testing.assert_allclose(out[..., 1:], arr[..., 1:])


def test_jets_3d_advection_consistency():
    """jets_3d stores the exact displacement used to evolve the density: a
    semi-Lagrangian re-advection of frame t with the stored flow reproduces
    frame t+1 (up to the known injection + decay terms)."""
    from opticalflowscivis_tpu.data.synthetic import _trilinear_sample, jets_3d

    arr = jets_3d(n_frames=8, grid=(16, 16, 16), n_jets=2, seed=4)
    assert arr.shape == (8, 16, 16, 16, 4)
    assert arr[..., 0].min() >= 0.0 and arr[..., 0].max() <= 1.0
    assert np.abs(arr[..., 1:]).max() <= 2.5 + 1e-5
    # density is being injected and transported — frames must change over time
    assert np.abs(arr[3, ..., 0] - arr[0, ..., 0]).max() > 1e-3

    zz, yy, xx = np.meshgrid(*[np.arange(16, dtype=np.float32)] * 3, indexing="ij")
    pts = np.stack([zz, yy, xx], axis=-1)
    t = 2
    adv = 0.98 * _trilinear_sample(arr[t, ..., 0], pts - arr[t, ..., 1:])
    # inject = max over jets; recover it from frame 0 vs nothing: instead test
    # that frame t+1 >= advected part everywhere (injection only adds) and
    # matches exactly away from the injection blobs.
    nxt = arr[t + 1, ..., 0]
    assert (nxt - np.clip(adv, 0, 1) >= -1e-5).all()
    far = arr[0, ..., 0] < 1e-4  # voxels with ~zero injection footprint
    np.testing.assert_allclose(nxt[far], np.clip(adv, 0, 1)[far], atol=1e-4)


def test_jets3d_registry_end_to_end(tmp_path, monkeypatch):
    """jets3d loads through the registry like any dataset (tiny generated pkl)."""
    import pickle

    from opticalflowscivis_tpu.data import get_spec, load_data
    from opticalflowscivis_tpu.data.synthetic import jets_3d

    spec = get_spec("jets3d")
    assert spec.ndim == 3 and spec.has_flow
    arr = jets_3d(n_frames=12, grid=(16, 16, 16), n_jets=2, seed=1)
    with open(tmp_path / "jets3d.pkl", "wb") as f:
        pickle.dump(arr, f)
    train, val = load_data("jets3d", 1, "train", str(tmp_path))
    test = load_data("jets3d", 1, "test", str(tmp_path))
    assert train.shape[1] == 3 and train.shape[-1] == 4
    assert test.ndim == 6


def test_device_flip_augment_matches_host():
    """device_flip_augment(code) reproduces flip_augment's block order exactly
    (codes 0..3 = [base, flip_ax0, flip_ax1, flip_both]), 2-D and 3-D."""
    import jax.numpy as jnp

    from opticalflowscivis_tpu.data.pipeline import device_flip_augment, group_tuples

    for ndim, shape in ((2, (9, 8, 6, 3)), (3, (9, 6, 4, 4, 4))):
        rng = np.random.default_rng(ndim)
        arr = rng.normal(size=shape).astype(np.float32)
        tuples = group_tuples(arr, 1)  # [N, 3, *S, C]
        hosted = flip_augment(tuples.reshape((-1,) + tuples.shape[2:]))
        # flip_augment works on [T,*S,C]; rebuild the tuple blocks per code
        n = tuples.shape[0] * 3
        blocks = [hosted[i * n:(i + 1) * n].reshape(tuples.shape) for i in range(4)]
        for code in range(4):
            got = device_flip_augment(
                jnp.asarray(tuples), jnp.full((tuples.shape[0],), code), ndim
            )
            np.testing.assert_allclose(np.asarray(got), blocks[code], atol=0)


def test_load_data_host_flip_override(tmp_path):
    from opticalflowscivis_tpu.data import load_data

    arr = rectangle_2d(n_frames=60, grid=(16, 16), box=(6, 8), seed=9)
    import pickle

    with open(tmp_path / "rectangle2d.pkl", "wb") as f:
        pickle.dump(arr, f)
    t_aug, _ = load_data("rectangle2d", 1, "train", str(tmp_path))
    t_base, _ = load_data("rectangle2d", 1, "train", str(tmp_path),
                          host_flip_aug=False)
    assert t_aug.shape[0] == 4 * t_base.shape[0]
    np.testing.assert_allclose(t_aug[: t_base.shape[0]], t_base)


def test_rectangle_2d_textured_background():
    """background="texture": static textured field behind the box, GT flow 0
    there, and the unsupervised photometric/census terms decisively prefer the
    GT flow over zero AND over a runaway flow (the zero-background failure
    mode this variant exists to fix — see synthetic.rectangle_2d docstring)."""
    import jax.numpy as jnp

    from opticalflowscivis_tpu.losses.upflow import photo_loss_multi_type
    from opticalflowscivis_tpu.ops.census import census_loss
    from opticalflowscivis_tpu.ops.warp import backward_warp

    arr = rectangle_2d(n_frames=12, grid=(64, 64), box=(20, 24), seed=3,
                       background="texture")
    density, flow = arr[..., 0], arr[..., 1:]
    bg = density * (np.abs(flow).sum(-1) == 0)  # visible background pixels
    assert (bg > 0).mean() > 0.3                # textured, not zero
    assert bg.max() <= 0.5 + 1e-6               # half-intensity background
    # static background: identical across frames wherever visible in both
    vis = (bg[0] > 0) & (bg[-1] > 0)
    np.testing.assert_allclose(bg[0][vis], bg[-1][vis])

    im1 = jnp.asarray(arr[:-1, ..., :1])
    im2 = jnp.asarray(arr[1:, ..., :1])
    gt = jnp.asarray(arr[:-1, ..., 1:])
    ones = jnp.ones_like(im1)

    def losses(fl):
        w = backward_warp(im2, fl)
        return (float(photo_loss_multi_type(im1, w, ones)),
                float(census_loss(im1, w)))

    p_gt, c_gt = losses(gt)
    p_zero, c_zero = losses(jnp.zeros_like(gt))
    p_big, c_big = losses(jnp.full_like(gt, 26.0))
    assert p_gt < p_zero < p_big
    assert c_gt < c_zero < c_big
    # Mid-range pull: the photometric loss must INCREASE monotonically with a
    # uniform background flow error (2 → 5 → 13 → 26 px), i.e. no plateau a
    # coarse-to-fine decode can stall on.  This is the multi-octave-background
    # property: per-pixel-only noise passes the 3-point probe above yet
    # plateaus from ~2 px out (decorrelated texture = constant loss), and
    # training measurably stalled at 13 px EPE on it (synthetic.rectangle_2d).
    ray = [p_zero] + [losses(jnp.full_like(gt, m))[0] for m in (2.0, 5.0, 13.0)]
    assert all(a < b for a, b in zip(ray, ray[1:])), ray
    # Beyond ~13 px the abs_robust penalty ((|d|+0.01)^0.4) saturates by
    # construction; only require no significant dip (the cost volume — which
    # sees the octave contrast at every feature-pyramid level — supplies the
    # long-range correction there, not the photometric gradient).
    assert p_big > ray[-1] * 0.95, (p_big, ray)


def test_rectangle_2d_pan_background():
    """background="pan": the full-field-motion regime (KITTI egomotion
    analogue).  Asserts the three properties the unsupervised recipe needs:
    every pixel moves (no static-background zero-flow attractor — the
    measured round-3 freeze mode), the stamped GT is the exact apparent
    displacement (warping by it reconstructs the frame away from occlusion),
    and zero flow is decisively NOT photometrically free."""
    import jax.numpy as jnp

    from opticalflowscivis_tpu.ops.census import census_loss
    from opticalflowscivis_tpu.ops.warp import backward_warp

    arr = rectangle_2d(n_frames=24, grid=(64, 64), box=(20, 24), seed=3,
                       background="pan")
    density, flow = arr[..., 0], arr[..., 1:]
    # full-field motion: the camera walk moves (nearly) every pixel most
    # frames; over the clip the zero-flow baseline is whole-pixels large
    assert (density > 0).all()  # background fills the frame
    epe_zero = np.sqrt((flow**2).sum(-1)).mean()
    assert epe_zero > 1.0, epe_zero
    # exact apparent displacement: integer pan + integer box steps -> nearest
    # warp by GT reproduces frame t except occlusion/inflow bands
    t = 4
    H, W = density.shape[1:]
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    ys = np.clip((yy + flow[t, ..., 0]).astype(int), 0, H - 1)
    xs = np.clip((xx + flow[t, ..., 1]).astype(int), 0, W - 1)
    match = np.abs(density[t + 1][ys, xs] - density[t]) < 1e-6
    assert match.mean() > 0.8, match.mean()

    im1 = jnp.asarray(arr[:-1, ..., :1])
    im2 = jnp.asarray(arr[1:, ..., :1])
    gt = jnp.asarray(arr[:-1, ..., 1:])
    c_gt = float(census_loss(im1, backward_warp(im2, gt)))
    c_zero = float(census_loss(im1, backward_warp(im2, jnp.zeros_like(gt))))
    # zero flow is NOT an attractor here: census at zero ≫ census at GT
    assert c_zero > 3 * c_gt, (c_zero, c_gt)


def test_lbs_sim_smoke_inflow_keeps_wake_unsteady():
    """Small LBS sim (same physics as lbs2d/vortex2d/vortex2d_fast): shape,
    finite fields, and — with the sustained inlet — a wake that keeps
    evolving rather than decaying to steady state.

    (Warp-by-v*stride quality is NOT asserted here: at toy scale the wake is
    quasi-steady and the near-cylinder boundary layer is large-|v| but
    time-stationary, so the probe is uninformative — the full-size check is
    the trained EPE on vortex2d, RESULTS.md.)"""
    from opticalflowscivis_tpu.data.lbs import lattice_boltzmann_2d

    stride = 20
    arr = lattice_boltzmann_2d(nx=120, ny=40, n_steps=3000, skip=2200,
                               sample_every=stride, inflow_u=0.12, seed=3)
    assert arr.shape == ((3000 - 2200) // stride, 40, 120, 3)
    assert np.isfinite(arr).all()
    # sustained inflow keeps the wake moving: mean per-frame change nonzero
    assert np.abs(np.diff(arr[..., 0], axis=0)).mean() > 1e-4


def test_vortex2d_fast_spec():
    from opticalflowscivis_tpu.data.registry import get_spec

    spec = get_spec("vortex2d_fast")
    assert spec.gt_flow_stride == 60.0
    assert spec.resample_stride == 0
    assert spec.has_flow and spec.generator is not None
