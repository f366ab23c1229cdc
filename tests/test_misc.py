"""Config roundtrip, benchmark loops on synthetic folders, CLI dispatch table."""

import json
import os

import numpy as np
import pytest

from opticalflowscivis_tpu.training import ModelConfig, TrainConfig


def test_trainconfig_json_roundtrip():
    cfg = TrainConfig(dataset="rectangle3d", exp=2,
                      model=ModelConfig.preset_3d(remat=True))
    back = TrainConfig.from_json(cfg.to_json())
    assert back == cfg
    assert back.model.bounded_warp_rz == 8 and back.model.remat


def test_cli_verbs_table():
    from opticalflowscivis_tpu.cli.__main__ import VERBS

    assert set(VERBS) >= {"train", "test", "inference_img", "inference_video",
                          "train_upflow", "test_upflow", "generate", "bench"}


@pytest.fixture()
def triplet_dirs(tmp_path):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    for d in ("a", "b"):
        p = tmp_path / d
        p.mkdir()
        f0 = rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8)
        f2 = rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8)
        mid = ((f0.astype(np.float32) + f2) / 2).astype(np.uint8)
        cv2.imwrite(str(p / "frame_00.png"), f0)
        cv2.imwrite(str(p / "frame_02.png"), f2)
        cv2.imwrite(str(p / "frame_01_gt.png"), mid)
    return str(tmp_path)


def test_bench_triplet_dirs(triplet_dirs):
    import jax
    import jax.numpy as jnp

    from opticalflowscivis_tpu.evalsuite.benchmarks import bench_triplet_dirs
    from opticalflowscivis_tpu.inference import Interpolator
    from opticalflowscivis_tpu.models import IFNet

    net = IFNet(ndim=2, in_channels=3, block_channels=(8, 8, 8),
                teacher_channels=8)
    x = jnp.zeros((1, 32, 32, 3))
    params = net.init(jax.random.PRNGKey(0), x, x, None)
    interp = Interpolator(net, params, 32)
    res = bench_triplet_dirs(interp, triplet_dirs)
    assert res["n"] == 2
    assert np.isfinite(res["psnr"]) and 0 <= res["ssim"] <= 1


def test_bench_latency_protocol():
    import jax
    import jax.numpy as jnp

    from opticalflowscivis_tpu.evalsuite.benchmarks import bench_latency
    from opticalflowscivis_tpu.inference import Interpolator
    from opticalflowscivis_tpu.models import IFNet

    net = IFNet(ndim=2, in_channels=1, block_channels=(8, 8, 8),
                teacher_channels=8)
    x = jnp.zeros((1, 32, 32, 1))
    params = net.init(jax.random.PRNGKey(0), x, x, None)
    interp = Interpolator(net, params, 32)
    res = bench_latency(interp, shape=(32, 32, 1), warmup=1, iters=3)
    assert res["pairs_per_sec"] > 0
