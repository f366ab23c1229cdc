"""Converter + KITTI/Vimeo IO tests (synthetic files on disk)."""

import os

import numpy as np
import pytest

from opticalflowscivis_tpu.data.converters import (
    convert_droplet3d,
    convert_fluidsimml,
    downscale_local_mean,
)
from opticalflowscivis_tpu.data.kitti import (
    read_flo,
    read_kitti_flow_png,
    write_flo,
    write_kitti_flow_png,
)


def test_downscale_local_mean():
    x = np.arange(16, dtype=np.float32).reshape(4, 4)
    out = downscale_local_mean(x, (2, 2))
    np.testing.assert_allclose(out, [[2.5, 4.5], [10.5, 12.5]])


def test_flo_roundtrip(tmp_path):
    flow = np.random.default_rng(0).normal(0, 4, (12, 20, 2)).astype(np.float32)
    path = str(tmp_path / "f.flo")
    write_flo(flow, path)
    back = read_flo(path)
    np.testing.assert_allclose(back, flow, atol=1e-6)


def test_kitti_png_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    flow = rng.normal(0, 10, (16, 24, 2)).astype(np.float32)
    flow = np.round(flow * 64) / 64  # representable in the uint16 encoding
    valid = (rng.random((16, 24, 1)) > 0.3).astype(np.float32)
    path = str(tmp_path / "k.png")
    write_kitti_flow_png(flow * valid, valid, path)
    back, vback = read_kitti_flow_png(path)
    np.testing.assert_allclose(vback, valid)
    np.testing.assert_allclose(back, flow * valid, atol=1 / 64)


def test_convert_droplet3d(tmp_path):
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    rng = np.random.default_rng(2)
    for i in range(4):
        vol = rng.integers(0, 256, (16, 16, 16), dtype=np.uint8)
        vol.tofile(str(raw_dir / f"v{i}.raw"))
    p_train, p_val = convert_droplet3d(
        str(raw_dir), str(tmp_path / "out"), volume_shape=(16, 16, 16),
        downscale=4, train_frac=0.75,
    )
    import pickle

    with open(p_train, "rb") as f:
        train = pickle.load(f)
    assert train.shape == (3, 4, 4, 4, 1)
    assert os.path.exists(p_val)


def test_convert_fluidsimml(tmp_path):
    rng = np.random.default_rng(3)
    csv = tmp_path / "sim.csv"
    table = rng.normal(0, 1, (2 * 8 * 8, 3)).astype(np.float32)
    np.savetxt(str(csv), table, delimiter=",")
    out = convert_fluidsimml([str(csv)], str(tmp_path / "o"), grid=(8, 8))
    import pickle

    with open(out, "rb") as f:
        data = pickle.load(f)
    assert data.shape == (2, 8, 8, 3)
    # channel order converted to (density, dy, dx)
    np.testing.assert_allclose(data[0, 0, 0], table[0][[0, 2, 1]], atol=1e-6)


def test_netcdf_gated():
    from opticalflowscivis_tpu.data.converters import convert_netcdf_2d

    with pytest.raises(ImportError, match="netCDF4"):
        convert_netcdf_2d("/nonexistent.nc", "/tmp", "x")


def test_convert_5jets(tmp_path):
    """convert_5jets: raw float32 .dat pairs → downsampled [T,D,H,W,4] pkl."""
    import pickle

    from opticalflowscivis_tpu.data.converters import convert_5jets

    os.makedirs(tmp_path / "Velocity")
    os.makedirs(tmp_path / "Density")
    rng = np.random.default_rng(0)
    for step in (1000, 1010):
        vel = rng.normal(size=(128, 128, 128, 3)).astype(np.float32)
        rho = rng.uniform(size=(128, 128, 128)).astype(np.float32)
        vel.tofile(tmp_path / "Velocity" / f"ns_{step}_v.dat")
        rho.tofile(tmp_path / "Density" / f"ns_{step}_r.dat")
    out = convert_5jets(str(tmp_path), str(tmp_path / "jets3d.pkl"), downscale=4)
    with open(out, "rb") as f:
        arr = pickle.load(f)
    assert arr.shape == (2, 32, 32, 32, 4)
    assert np.isfinite(arr).all()


def test_convert_5jets_missing_density(tmp_path):
    from opticalflowscivis_tpu.data.converters import convert_5jets

    os.makedirs(tmp_path / "Velocity")
    vel = np.ones((128, 128, 128, 3), np.float32)
    vel.tofile(tmp_path / "Velocity" / "ns_5_v.dat")
    out = convert_5jets(str(tmp_path), str(tmp_path / "o.pkl"), downscale=8)
    import pickle

    with open(out, "rb") as f:
        arr = pickle.load(f)
    # density falls back to |v| = sqrt(3)
    np.testing.assert_allclose(arr[..., 0], np.sqrt(3), rtol=1e-5)
    np.testing.assert_allclose(arr[..., 1:], 1.0 / 8, rtol=1e-5)
