"""Device-side synthetic generation: oracle parity + an end-to-end fit.

The numpy generators (data/synthetic.py ⇔ Datasets/create_data_3d.py:41-138)
are the oracle; the device path must reproduce them bit-for-bit from the same
trajectory so `fit_device_gen` trains on the same distribution the HBM-upload
path would, just without the relay bound.
"""

import numpy as np
import jax.numpy as jnp

from opticalflowscivis_tpu.data.device_synthetic import (
    box_density_device,
    tuple_positions,
)
from opticalflowscivis_tpu.data.pipeline import group_tuples
from opticalflowscivis_tpu.data.synthetic import _box_trajectory, rectangle_3d

GRID, BOX = (8, 10, 12), (2, 3, 4)


def test_box_density_matches_numpy_generator():
    # rectangle_3d(with_flow=False) consumes its rng only for the trajectory,
    # so a fresh rng with the same seed yields the same positions
    arr = rectangle_3d(n_frames=9, grid=GRID, box=BOX, seed=3, with_flow=False)
    pos = _box_trajectory(
        np.random.default_rng(3), 9, GRID, BOX, vel_max=8, max_seq=10
    )[:9]
    dev = box_density_device(jnp.asarray(pos, jnp.int32), GRID, BOX)
    np.testing.assert_array_equal(np.asarray(dev), arr)


def test_tuple_positions_match_group_tuples_order():
    n = 4
    arr = rectangle_3d(
        n_frames=3 * n, grid=GRID, box=BOX, seed=5, with_flow=False
    )
    host_tuples = group_tuples(arr, 1)  # [N, (t, t+2, t+1), *S, 1]
    pos = tuple_positions(np.random.default_rng(5), n, GRID, BOX)
    dev = box_density_device(jnp.asarray(pos), GRID, BOX)
    assert pos.dtype == np.int32 and pos.shape == (n, 3, 3)
    np.testing.assert_array_equal(np.asarray(dev), host_tuples)


def test_fit_device_gen_trains_on_fresh_tuples(tmp_path):
    from opticalflowscivis_tpu.losses.rife import RIFELossWeights
    from opticalflowscivis_tpu.training import ModelConfig, TrainConfig, Trainer

    g, grid, box = 16, (16, 16, 16), (4, 4, 4)
    cfg = TrainConfig(
        dataset="rectangle3d",
        batch_size=8,
        epochs=2,
        model=ModelConfig.preset_3d(),
        loss=RIFELossWeights.preset_3d(),
        pad_multiple=16,
        data_dir=str(tmp_path / "d"),
        log_dir=str(tmp_path / "log"),
        results_dir=str(tmp_path / "res"),
    )
    tr = Trainer(cfg)

    seen = []

    def pos_sampler(epoch):
        p = tuple_positions(
            np.random.default_rng(100 + epoch), 8, grid, box, vel_max=3
        )
        seen.append(p)
        return p

    val_pos = tuple_positions(np.random.default_rng(7), 8, grid, box)
    hist = tr.fit_device_gen(
        lambda p: box_density_device(p, grid, box),
        pos_sampler,
        val_pos,
        steps_per_epoch=1,
        log_every=1,
    )
    assert len(hist) == 2 and np.isfinite(hist[-1]["loss_G"])
    # fresh trajectory per epoch — the whole point of the device-gen path
    assert len(seen) == 2 and not np.array_equal(seen[0], seen[1])
    import os

    assert os.path.exists(os.path.join(tr.results_dir, "loss.json"))
