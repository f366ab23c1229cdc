"""Wired training paths for the external photo datasets: Vimeo90K triplets
(Flow-2D/dataset.py + train.py:78-100) and KITTI multiview crops with
boundary-dilated warping (UPFlow/dataset/kitti_dataset.py:341-431,
UPFlow/utils/tools.py:393-541)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from opticalflowscivis_tpu.data.kitti import (
    KittiPairDataset,
    kitti_photometric_normalize,
)
from opticalflowscivis_tpu.data.vimeo import VimeoDataset


def _make_vimeo_root(tmp_path, n_triplets=3, size=(48, 64)):
    root = tmp_path / "vimeo"
    rng = np.random.default_rng(0)
    names = []
    for i in range(n_triplets):
        name = f"0000{i}/0001"
        d = root / "sequences" / name
        os.makedirs(d)
        for j in (1, 2, 3):
            img = (rng.uniform(0, 255, size)).astype(np.uint8)
            cv2.imwrite(str(d / f"im{j}.png"), img)
        names.append(name)
    (root / "tri_trainlist.txt").write_text("\n".join(names) + "\n")
    (root / "tri_testlist.txt").write_text(names[0] + "\n")
    return str(root)


def test_vimeo_dataset_samples_augmented_tuples(tmp_path):
    root = _make_vimeo_root(tmp_path)
    ds = VimeoDataset(root, split="train", crop=(32, 32), seed=1)
    assert len(ds) == 3
    batch = ds.sample(4)
    assert batch.shape == (4, 3, 32, 32, 1)
    assert batch.dtype == np.float32
    assert 0.0 <= batch.min() and batch.max() <= 1.0


def test_vimeo_fit_stream_two_steps(tmp_path):
    """2-step smoke train on fake Vimeo dirs through Trainer.fit_stream."""
    from opticalflowscivis_tpu.losses.rife import RIFELossWeights
    from opticalflowscivis_tpu.training import ModelConfig, TrainConfig, Trainer

    root = _make_vimeo_root(tmp_path)
    ds = VimeoDataset(root, split="train", crop=(32, 32), seed=2)
    cfg = TrainConfig(
        dataset="vimeo2d", batch_size=8,
        model=ModelConfig(block_channels=(8, 8, 8), teacher_channels=8,
                          bfloat16=False),
        loss=RIFELossWeights.preset_2d(),
        data_dir=str(tmp_path / "d"), log_dir=str(tmp_path / "l"),
        results_dir=str(tmp_path / "r"),
    )
    tr = Trainer(cfg)
    val = ds.sample(8)
    hist = tr.fit_stream(lambda: ds.sample(8), val, steps_per_epoch=2,
                         epochs=1, log_every=0)
    assert len(hist) == 1
    assert np.isfinite(hist[0]["loss_G"])
    assert os.path.exists(tr.checkpoint_path())


def _make_kitti_multiview(tmp_path, n_seq=2, n_frames=3, size=(96, 160)):
    d = tmp_path / "mv"
    os.makedirs(d)
    rng = np.random.default_rng(3)
    for s in range(n_seq):
        base = rng.uniform(0, 255, size + (3,)).astype(np.uint8)
        for f in range(n_frames):
            # shift content so consecutive frames have real apparent motion
            img = np.roll(base, shift=2 * f, axis=1)
            cv2.imwrite(str(d / f"{s:06d}_{10 + f:02d}.png"), img)
    return str(d)


def test_kitti_pair_dataset_crops_and_raw_windows(tmp_path):
    d = _make_kitti_multiview(tmp_path)
    ds = KittiPairDataset(d, crop=(64, 64), rho=8, seed=0)
    assert len(ds) == 4  # 2 sequences x (3 frames -> 2 pairs)
    b = ds.sample(3)
    assert b["im1"].shape == (3, 64, 64, 3)
    assert b["im1_raw"].shape == (3, 80, 80, 3)
    np.testing.assert_array_equal(b["start"], np.full((3, 2), 8.0))
    # the crop is exactly the raw window's interior
    np.testing.assert_allclose(b["im1"], b["im1_raw"][:, 8:-8, 8:-8])
    np.testing.assert_allclose(b["im2"], b["im2_raw"][:, 8:-8, 8:-8])


def test_kitti_normalize_is_mean_subtraction():
    img = np.full((4, 4, 3), 0.5, np.float32)
    out = kitti_photometric_normalize(img)
    np.testing.assert_allclose(
        out[0, 0],
        0.5 - np.asarray([114.785955, 110.1753, 104.920005]) / 255.0,
        atol=1e-6,
    )


def test_kitti_fit_exercises_boundary_warp(tmp_path):
    """2-step smoke train: crop-offset boundary-dilated warping inside the
    jitted UPFlow step (crop + rho window threaded into the photometric term)."""
    from opticalflowscivis_tpu.losses.upflow import UPFlowLossConfig
    from opticalflowscivis_tpu.models import UPFlowConfig
    from opticalflowscivis_tpu.training.upflow_trainer import (
        UPFlowTrainConfig,
        UPFlowTrainer,
    )

    d = _make_kitti_multiview(tmp_path)
    ds = KittiPairDataset(d, crop=(64, 64), rho=8, seed=1)
    cfg = UPFlowTrainConfig(
        batch_size=8, bfloat16=False, exp_dir=str(tmp_path / "exp"),
        pad_multiple=64,
        model=UPFlowConfig(
            num_chs=(3, 4, 8, 8, 12, 16, 16),
            estimator_f_channels=(16, 16, 12, 8, 8),
            context_f_channels=(16, 16, 16, 12, 8, 8, 2),
            search_range=2,
        ),
        loss=UPFlowLossConfig(smooth_order_1_weight=0.1),
    )
    tr = UPFlowTrainer(cfg)
    hist = tr.fit_kitti(ds, steps_per_epoch=2, epochs=1, log_every=0)
    assert len(hist) == 1
    assert np.isfinite(hist[0]["loss_total"])


def test_boundary_warp_changes_photo_loss_vs_zero_offset(tmp_path):
    """The raw-window path must actually reach the loss: with content beyond
    the crop differing from the border clamp, photo losses must differ."""
    import jax
    import jax.numpy as jnp

    from opticalflowscivis_tpu.losses.upflow import UPFlowLossConfig, upflow_losses

    rng = np.random.default_rng(7)
    raw1 = jnp.asarray(rng.uniform(0, 1, (1, 48, 48, 3)).astype(np.float32))
    raw2 = jnp.asarray(rng.uniform(0, 1, (1, 48, 48, 3)).astype(np.float32))
    im1, im2 = raw1[:, 8:40, 8:40], raw2[:, 8:40, 8:40]
    start = jnp.full((1, 2), 8.0)
    # constant flow larger than 0 pushes samples outside the crop
    flow = jnp.full((1, 32, 32, 2), 4.0)
    outputs = {"flow_f": flow, "flow_b": -flow,
               "flows": [(flow[:, ::4, ::4] / 4, -flow[:, ::4, ::4] / 4)]}
    cfg = UPFlowLossConfig()
    _, with_raw = upflow_losses(outputs, im1, im2, cfg, raw=(raw1, raw2, start))
    _, without = upflow_losses(outputs, im1, im2, cfg)
    assert not np.isclose(float(with_raw["photo_loss"]),
                          float(without["photo_loss"]))


def test_kitti_hbm_cache_builds_and_dedups(tmp_path):
    from opticalflowscivis_tpu.data.kitti import KittiHBMCache

    d = _make_kitti_multiview(tmp_path)
    cache = KittiHBMCache(d, max_pairs=None, crop=(64, 64), rho=8)
    assert len(cache) == 4
    assert cache.frames.shape == (6, 96, 160, 3)  # 2 seq x 3 frames, deduped
    assert cache.pair_idx.shape == (4, 2)
    # capped variant keeps only referenced frames
    small = KittiHBMCache(d, max_pairs=2, crop=(64, 64), rho=8)
    assert len(small) == 2 and small.frames.shape[0] <= 4


def test_kitti_fit_hbm_two_steps(tmp_path):
    """HBM-resident path: on-device crops + aug + boundary-dilated warping;
    only indices/offsets/bits cross the host boundary per step (the relay-
    friendly KITTI training mode — VERDICT r2 item 7)."""
    from opticalflowscivis_tpu.data.kitti import KittiHBMCache
    from opticalflowscivis_tpu.losses.upflow import UPFlowLossConfig
    from opticalflowscivis_tpu.models import UPFlowConfig
    from opticalflowscivis_tpu.training.upflow_trainer import (
        UPFlowTrainConfig,
        UPFlowTrainer,
    )

    d = _make_kitti_multiview(tmp_path)
    cache = KittiHBMCache(d, max_pairs=None, crop=(64, 64), rho=8)
    cfg = UPFlowTrainConfig(
        batch_size=8, bfloat16=False, exp_dir=str(tmp_path / "exp"),
        pad_multiple=64,
        model=UPFlowConfig(
            num_chs=(3, 4, 8, 8, 12, 16, 16),
            estimator_f_channels=(16, 16, 12, 8, 8),
            context_f_channels=(16, 16, 16, 12, 8, 8, 2),
            search_range=2,
        ),
        loss=UPFlowLossConfig(smooth_order_1_weight=0.1),
    )
    tr = UPFlowTrainer(cfg)
    hist = tr.fit_kitti_hbm(cache, steps_per_epoch=2, epochs=1, log_every=0)
    assert len(hist) == 1
    assert np.isfinite(hist[0]["loss_total"])
    assert os.path.exists(os.path.join(str(tmp_path / "exp"), "upflow.ckpt"))
    # repeated calls (resume / staged schedules / benchmarks) must reuse both
    # the device-resident frame upload and the jitted step — a fresh closure
    # per call recompiles for minutes over the remote relay (regression:
    # round-3 throughput bench read 0.166 it/s because the "steady-state"
    # epoch paid a full recompile)
    jit1, frames1 = tr._hbm_jit_step, tr._hbm_frames_dev
    tr.fit_kitti_hbm(cache, steps_per_epoch=1, epochs=1, log_every=0)
    assert tr._hbm_jit_step is jit1
    assert tr._hbm_frames_dev is frames1


def test_prefetch_sampler_threads_and_slicing(tmp_path):
    from opticalflowscivis_tpu.data.pipeline import PrefetchSampler

    d = _make_kitti_multiview(tmp_path)
    pf = PrefetchSampler(
        batch_size=4, workers=2, depth=2,
        make_dataset=lambda w: KittiPairDataset(d, crop=(64, 64), seed=w),
    )
    try:
        b = pf.sample(4)
        assert b["im1"].shape == (4, 64, 64, 3)
        small = pf.sample(2)  # init-time probe uses a smaller batch
        assert small["im1"].shape == (2, 64, 64, 3)
    finally:
        pf.close()
