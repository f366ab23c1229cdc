"""Native fastprep vs the numpy pipeline oracle (bit-equality)."""

import numpy as np
import pytest

from opticalflowscivis_tpu.data import rectangle_2d
from opticalflowscivis_tpu.data.fastprep import fastprep_available, prepare_tuples_native
from opticalflowscivis_tpu.data.pipeline import flip_augment, group_tuples, temporal_resample

pytestmark = pytest.mark.skipif(
    not fastprep_available(), reason="native fastprep not buildable here"
)


@pytest.mark.parametrize("exp", [1, 2])
def test_native_matches_numpy(exp):
    arr = rectangle_2d(n_frames=99, grid=(32, 32), box=(10, 14), seed=1)
    ref = group_tuples(flip_augment(temporal_resample(arr, 3)), exp)
    out = prepare_tuples_native(arr, exp=exp, resample_stride=3, flip_axes=2)
    assert np.array_equal(ref, out)


def test_native_no_aug_no_resample():
    arr = rectangle_2d(n_frames=30, grid=(16, 16), box=(6, 8), seed=2)
    ref = group_tuples(arr, 1)
    out = prepare_tuples_native(arr, exp=1, resample_stride=1, flip_axes=0)
    assert np.array_equal(ref, out)


def test_native_single_channel():
    arr = rectangle_2d(n_frames=45, grid=(16, 16), box=(6, 8), seed=3)[..., :1]
    ref = group_tuples(flip_augment(temporal_resample(arr, 3)), 1)
    out = prepare_tuples_native(arr, exp=1)
    assert np.array_equal(ref, out)


def test_registry_prepare_native_equals_numpy():
    """The registry's _prepare must give identical tuples on both paths."""
    from opticalflowscivis_tpu.data.registry import _prepare, get_spec
    import opticalflowscivis_tpu.data.fastprep as fp

    spec = get_spec("rectangle2d")
    arr = rectangle_2d(n_frames=99, grid=(32, 32), box=(10, 14), seed=4)
    native = _prepare(spec, arr, [(0, 99)], 1, augment=True)
    orig = fp.fastprep_available
    fp.fastprep_available = lambda: False
    try:
        ref = _prepare(spec, arr, [(0, 99)], 1, augment=True)
    finally:
        fp.fastprep_available = orig
    assert np.array_equal(native, ref)

def test_native_3d_matches_numpy():
    from opticalflowscivis_tpu.data import rectangle_3d

    vol = rectangle_3d(n_frames=60, grid=(16, 16, 16), box=(6, 8, 6), seed=7)
    ref = group_tuples(flip_augment(vol), 1)  # 3-D path: no temporal resample
    out = prepare_tuples_native(vol, resample_stride=1, flip_axes=2)
    assert np.array_equal(ref, out)
