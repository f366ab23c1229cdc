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
    pan_pair_positions,
    pan_pairs_device,
    pan_scene_host,
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


def test_pan_pairs_match_rectangle_2d_pan():
    """Device pan composition == rectangle_2d(background='pan') bit-for-bit
    (frames AND the stamped apparent flow) from the same rng stream."""
    from opticalflowscivis_tpu.data.synthetic import rectangle_2d

    n, grid, box = 7, (64, 64), (20, 24)
    arr = rectangle_2d(n_frames=n, grid=grid, box=box, seed=9,
                       background="pan", pan_vel_max=3)
    tex, big, bt, ct = pan_scene_host(
        np.random.default_rng(9), n, grid, box, pan_vel_max=3
    )
    bp, cp = pan_pair_positions(bt, ct, np.arange(n - 1))
    im1, im2, flow = pan_pairs_device(
        jnp.asarray(tex), jnp.asarray(big), jnp.asarray(bp),
        jnp.asarray(cp), grid,
    )
    np.testing.assert_array_equal(np.asarray(im1)[..., 0], arr[:-1, ..., 0])
    np.testing.assert_array_equal(np.asarray(im2)[..., 0], arr[1:, ..., 0])
    np.testing.assert_array_equal(np.asarray(flow), arr[:-1, ..., 1:])


def test_upflow_fit_device_gen_fresh_scene_per_epoch(tmp_path):
    from opticalflowscivis_tpu.losses import UPFlowLossConfig
    from opticalflowscivis_tpu.training.upflow_trainer import (
        UPFlowTrainConfig,
        UPFlowTrainer,
    )
    from tests.test_upflow import TINY

    grid, box = (64, 64), (20, 24)
    cfg = UPFlowTrainConfig(
        batch_size=8, bfloat16=False, exp_dir=str(tmp_path), model=TINY,
        pad_multiple=64, loss=UPFlowLossConfig(smooth_order_1_weight=0.1),
    )
    tr = UPFlowTrainer(cfg)
    seen = []

    def pos_sampler(epoch):
        tex, big, bt, ct = pan_scene_host(
            np.random.default_rng(100 + epoch), 9, grid, box, pan_vel_max=3
        )
        seen.append(bt)
        bp, cp = pan_pair_positions(bt, ct, np.arange(8))
        return ({"tex": jnp.asarray(tex), "big": jnp.asarray(big)},
                {"box": bp, "cam": cp})

    def gen_fn(const, pos):
        return pan_pairs_device(
            const["tex"], const["big"], pos["box"], pos["cam"], grid,
            in_channels=3,
        )

    # held-out val with GT flow from the host generator
    from opticalflowscivis_tpu.data.synthetic import rectangle_2d
    from opticalflowscivis_tpu.training.upflow_trainer import frames_to_pairs

    v = rectangle_2d(n_frames=9, grid=grid, box=box, seed=7,
                     background="pan", pan_vel_max=3)
    val_pairs = frames_to_pairs(v[..., :1], in_channels=3)
    val_flow = v[:-1, ..., 1:]
    hist = tr.fit_device_gen(
        gen_fn, pos_sampler, steps_per_epoch=1, epochs=2, log_every=0,
        val_pairs=val_pairs, val_flow=val_flow,
    )
    assert len(hist) == 2
    assert np.isfinite(hist[-1]["loss_total"])
    assert "val_epe" in hist[-1] and np.isfinite(hist[-1]["val_epe"])
    assert len(seen) == 2 and not np.array_equal(seen[0], seen[1])


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

    # resume must NOT replay epoch 0/1 seeds (ADVICE r3 medium): a resumed
    # run picks up at the epoch count recorded in loss.json, so pos_sampler
    # sees fresh epoch numbers and the data stays never-repeated
    tr2 = Trainer(cfg)
    epochs_seen = []

    def pos_sampler2(epoch):
        epochs_seen.append(epoch)
        return tuple_positions(
            np.random.default_rng(100 + epoch), 8, grid, box, vel_max=3
        )

    hist2 = tr2.fit_device_gen(
        lambda p: box_density_device(p, grid, box),
        pos_sampler2,
        val_pos,
        steps_per_epoch=1,
        epochs=1,
        log_every=0,
        resume=True,
    )
    assert epochs_seen == [2]
    assert len(hist2) == 1


def test_upflow_fit_device_gen_resume_offsets_epoch_seed(tmp_path):
    """ADVICE r3 (medium): --resume must continue the epoch seed sequence,
    not re-train on the scenes already recorded in loss.json."""
    from opticalflowscivis_tpu.losses import UPFlowLossConfig
    from opticalflowscivis_tpu.training.upflow_trainer import (
        UPFlowTrainConfig,
        UPFlowTrainer,
    )
    from tests.test_upflow import TINY

    grid, box = (64, 64), (20, 24)
    cfg = UPFlowTrainConfig(
        batch_size=8, bfloat16=False, exp_dir=str(tmp_path), model=TINY,
        pad_multiple=64, loss=UPFlowLossConfig(smooth_order_1_weight=0.1),
    )

    def make_sampler(record):
        def pos_sampler(epoch):
            record.append(epoch)
            tex, big, bt, ct = pan_scene_host(
                np.random.default_rng(100 + epoch), 9, grid, box, pan_vel_max=3
            )
            bp, cp = pan_pair_positions(bt, ct, np.arange(8))
            return ({"tex": jnp.asarray(tex), "big": jnp.asarray(big)},
                    {"box": bp, "cam": cp})
        return pos_sampler

    def gen_fn(const, pos):
        return pan_pairs_device(
            const["tex"], const["big"], pos["box"], pos["cam"], grid,
            in_channels=3,
        )

    first_epochs: list[int] = []
    tr = UPFlowTrainer(cfg)
    tr.fit_device_gen(gen_fn, make_sampler(first_epochs),
                      steps_per_epoch=1, epochs=2, log_every=0)
    assert first_epochs == [0, 1]

    resumed_epochs: list[int] = []
    tr2 = UPFlowTrainer(cfg)
    hist = tr2.fit_device_gen(gen_fn, make_sampler(resumed_epochs),
                              steps_per_epoch=1, epochs=1, log_every=0,
                              resume=True)
    assert resumed_epochs == [2]
    assert len(hist) == 1


def test_multibox_pan_pairs_match_rectangles_2d():
    """Device multi-box pan composition reproduces the numpy oracle
    (rectangles_2d(background='pan')) bit-for-bit from the same rng."""
    from opticalflowscivis_tpu.data.device_synthetic import (
        multibox_pan_pair_positions,
        multibox_pan_pairs_device,
        multibox_pan_scene_host,
    )
    from opticalflowscivis_tpu.data.synthetic import rectangles_2d

    grid = (64, 64)
    boxes = ((20, 24), (14, 12))
    n = 7
    ref = rectangles_2d(n_frames=n, grid=grid, boxes=boxes, vel_max=4,
                        max_seq=15, seed=5, background="pan", pan_vel_max=6)
    texs, big, bts, ct = multibox_pan_scene_host(
        np.random.default_rng(5), n, grid, boxes, vel_max=4, max_seq=15,
        pan_vel_max=6,
    )
    idx = np.arange(n - 1)
    bp, cp = multibox_pan_pair_positions(bts, ct, idx)
    im1, im2, flow = multibox_pan_pairs_device(
        [jnp.asarray(t) for t in texs], jnp.asarray(big),
        jnp.asarray(bp), jnp.asarray(cp), grid, in_channels=1,
    )
    np.testing.assert_array_equal(np.asarray(im1)[..., 0], ref[:-1, ..., 0])
    np.testing.assert_array_equal(np.asarray(im2)[..., 0], ref[1:, ..., 0])
    np.testing.assert_array_equal(np.asarray(flow), ref[:-1, ..., 1:])


def test_fit_device_gen_failed_restore_does_not_offset(tmp_path):
    """ADVICE r4 (medium): resume with a missing/corrupted checkpoint must
    NOT apply the epoch offset or truncate loss.json — otherwise a checkpoint
    corrupted by a worker crash would silently restart the run from scratch
    while appearing (epoch numbering, truncated log) to continue it."""
    import json
    import os

    from opticalflowscivis_tpu.losses import UPFlowLossConfig
    from opticalflowscivis_tpu.training.upflow_trainer import (
        UPFlowTrainConfig,
        UPFlowTrainer,
    )
    from tests.test_upflow import TINY

    grid, box = (64, 64), (20, 24)
    cfg = UPFlowTrainConfig(
        batch_size=8, bfloat16=False, exp_dir=str(tmp_path), model=TINY,
        pad_multiple=64, loss=UPFlowLossConfig(smooth_order_1_weight=0.1),
    )
    # a prior run's metadata, but no checkpoint (crash corrupted / lost it)
    stale = [{"loss_total": 1.0}, {"loss_total": 0.9}]
    with open(tmp_path / "loss.json", "w") as f:
        json.dump({"loss": stale}, f)
    with open(tmp_path / "ckpt_meta.json", "w") as f:
        json.dump({"epochs_completed": 2}, f)

    trained_epochs: list[int] = []

    def pos_sampler(epoch):
        trained_epochs.append(epoch)
        tex, big, bt, ct = pan_scene_host(
            np.random.default_rng(100 + epoch), 9, grid, box, pan_vel_max=3
        )
        bp, cp = pan_pair_positions(bt, ct, np.arange(8))
        return ({"tex": jnp.asarray(tex), "big": jnp.asarray(big)},
                {"box": bp, "cam": cp})

    def gen_fn(const, pos):
        return pan_pairs_device(
            const["tex"], const["big"], pos["box"], pos["cam"], grid,
            in_channels=3,
        )

    tr = UPFlowTrainer(cfg)
    hist = tr.fit_device_gen(gen_fn, pos_sampler, steps_per_epoch=1,
                             epochs=1, log_every=0, resume=True)
    # probe samples the guessed epoch (2) for shapes, but TRAINING must run
    # epoch 0 — the offset is rejected because nothing was restored
    assert trained_epochs[-1] == 0 and len(hist) == 1
    with open(tmp_path / "loss.json") as f:
        log = json.load(f)["loss"]
    assert log[:2] == stale and len(log) == 3  # untruncated + one appended
    assert os.path.exists(tmp_path / "upflow.ckpt")


def test_fit_hbm_stop_resume_continues_epochs(tmp_path):
    """ADVICE r4 (low): fit(resume=True) must continue the epoch/step
    numbering and not append duplicate epochs to loss.json."""
    import json

    from opticalflowscivis_tpu.losses import UPFlowLossConfig
    from opticalflowscivis_tpu.training.upflow_trainer import (
        UPFlowTrainConfig,
        UPFlowTrainer,
    )
    from tests.test_upflow import TINY

    rng = np.random.default_rng(0)
    pairs = rng.random((8, 2, 64, 64, 3), np.float32)
    cfg = UPFlowTrainConfig(
        batch_size=8, bfloat16=False, exp_dir=str(tmp_path), model=TINY,
        pad_multiple=64, loss=UPFlowLossConfig(smooth_order_1_weight=0.1),
    )
    tr = UPFlowTrainer(cfg)
    tr.fit(pairs, epochs=2, log_every=0)
    tr2 = UPFlowTrainer(cfg)
    hist = tr2.fit(pairs, epochs=1, log_every=0, resume=True)
    assert len(hist) == 1
    with open(tmp_path / "loss.json") as f:
        log = json.load(f)["loss"]
    assert len(log) == 3  # 2 original + 1 resumed, no duplicates
    with open(tmp_path / "ckpt_meta.json") as f:
        assert json.load(f)["epochs_completed"] == 3


def test_fit_device_gen_scan_chunk_equivalence(tmp_path):
    """Chunked epoch dispatch (scan_chunk) is bit-identical to one scan.

    The rng folds on the ABSOLUTE step index and chunking preserves data
    order, so params after an epoch must not depend on the chunking —
    the axon-crash mitigation (scan_chunk comment in UPFlowTrainConfig)
    cannot change training results.
    """
    import jax

    from opticalflowscivis_tpu.training.upflow_trainer import (
        UPFlowTrainConfig,
        UPFlowTrainer,
    )
    from tests.test_upflow import TINY

    grid, box = (64, 64), (20, 24)

    def make(chunk, sub):
        cfg = UPFlowTrainConfig(
            batch_size=8, bfloat16=False, exp_dir=str(tmp_path / sub),
            model=TINY, pad_multiple=64, scan_chunk=chunk,
        )
        tr = UPFlowTrainer(cfg)

        def pos_sampler(epoch):
            tex, big, bt, ct = pan_scene_host(
                np.random.default_rng(100 + epoch), 41, grid, box,
                pan_vel_max=3,
            )
            bp, cp = pan_pair_positions(bt, ct, np.arange(40))
            return ({"tex": jnp.asarray(tex), "big": jnp.asarray(big)},
                    {"box": bp, "cam": cp})

        def gen_fn(const, pos):
            return pan_pairs_device(
                const["tex"], const["big"], pos["box"], pos["cam"], grid,
                in_channels=3,
            )

        hist = tr.fit_device_gen(
            gen_fn, pos_sampler, steps_per_epoch=5, epochs=1, log_every=0,
        )
        return tr, hist

    tr_a, hist_a = make(2, "a")   # chunks of 2, 2, 1
    tr_b, hist_b = make(64, "b")  # one scan
    assert np.isclose(hist_a[0]["loss_total"], hist_b[0]["loss_total"],
                      rtol=0, atol=1e-6)
    la = jax.tree.leaves(tr_a.state.params)
    lb = jax.tree.leaves(tr_b.state.params)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
