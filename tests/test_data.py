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
