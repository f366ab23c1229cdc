"""3-D training path — rectangle3d through the registry + Trainer presets."""

import numpy as np
import pytest

from opticalflowscivis_tpu.losses.rife import RIFELossWeights
from opticalflowscivis_tpu.training import ModelConfig, TrainConfig, Trainer


def test_3d_fit_and_best_val_checkpoint(tmp_path):
    cfg = TrainConfig(
        dataset="rectangle3d",
        epochs=2,
        batch_size=8,
        model=ModelConfig(ndim=3, block_channels=(12, 8, 8), teacher_channels=8,
                          conv0_kernel=3, bfloat16=False),
        loss=RIFELossWeights.preset_3d(),
        keep_best_only=True,  # Flow-3D/train.py:400-412 behaviour
        early_stop_patience=1000,
        data_dir=str(tmp_path / "d"), log_dir=str(tmp_path / "l"),
        results_dir=str(tmp_path / "r"),
    )
    # 3-D preset: plain L1 recon (no LapLoss), photo/reg off; distill defaults
    # OFF (measured collapse at the reference's 0.1 — see preset_3d docstring)
    assert not cfg.loss.use_lap and cfg.loss.distill == 0.0
    assert RIFELossWeights.preset_3d(distill=0.1).distill == 0.1

    from opticalflowscivis_tpu.data import group_tuples, rectangle_3d

    arr = rectangle_3d(n_frames=30, grid=(16, 16, 16), box=(6, 8, 6), seed=4)
    tuples = group_tuples(arr, 1).astype(np.float32)
    tr = Trainer(cfg)
    hist = tr.fit(tuples[:8], tuples[8:10], epochs=2, log_every=0)
    assert len(hist) == 2
    assert np.isfinite(hist[-1]["loss_G"])
    # checkpoint written (best-val mode saves at least on the first epoch)
    import os

    assert os.path.exists(tr.checkpoint_path())
