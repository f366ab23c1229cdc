"""Training runtime tests — loss decreases, sharded step runs on the 8-dev mesh,
loss.json parity, checkpoint roundtrip."""

import json
import os

import numpy as np
import pytest

from opticalflowscivis_tpu.data import group_tuples, rectangle_2d
from opticalflowscivis_tpu.losses.rife import RIFELossWeights
from opticalflowscivis_tpu.training import ModelConfig, TrainConfig, Trainer


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("train")
    cfg = TrainConfig(
        dataset="rectangle2d",
        epochs=3,
        batch_size=8,
        model=ModelConfig(block_channels=(16, 12, 8), teacher_channels=8,
                          bfloat16=False),
        loss=RIFELossWeights.preset_2d(flow_supervised=True),
        data_dir=str(tmp / "data"),
        log_dir=str(tmp / "log"),
        results_dir=str(tmp / "res"),
        optim=__import__("opticalflowscivis_tpu.training.config", fromlist=["OptimConfig"]).OptimConfig(
            lr_max=1e-3, warmup_steps=5
        ),
    )
    arr = rectangle_2d(n_frames=99, grid=(32, 32), box=(10, 14), seed=5)
    tuples = group_tuples(arr, 1)
    return cfg, tuples


def test_fit_decreases_loss_and_uses_mesh(tiny_setup):
    cfg, tuples = tiny_setup
    tr = Trainer(cfg)
    assert tr.mesh.shape["data"] == 8  # all virtual devices on the data axis
    hist = tr.fit(tuples[:24], tuples[24:32], epochs=3, log_every=0)
    assert len(hist) == 3
    assert hist[-1]["loss_G"] < hist[0]["loss_G"] * 1.05  # no blow-up
    assert np.isfinite(hist[-1]["loss_G"])

    # loss.json parity: list of 7-component tuples
    path = os.path.join(tr.results_dir, "loss.json")
    with open(path) as f:
        data = json.load(f)
    assert len(data["val_loss"]) == 3
    assert len(data["val_loss"][0]) == 7

    # checkpoint roundtrip
    tr.save_checkpoint()
    step_before = int(tr.state.step)
    assert tr.load_checkpoint()
    assert int(tr.state.step) == step_before

    # eval-mode predict returns extras
    parts, extras = tr.predict(tuples[:8])
    assert extras["pred"].shape == (8, 32, 32, 1)
    assert extras["flow"].shape == (8, 32, 32, 4)


def test_hbm_resident_path_matches_streaming(tiny_setup):
    """The HBM-resident dataset path (bulk upload + per-step index gather) is
    numerically identical to the streaming path — same shuffle stream, same
    batches, same updates."""
    import dataclasses

    import jax

    cfg, tuples = tiny_setup
    cfg_stream = dataclasses.replace(cfg, hbm_dataset_gb=0.0)
    tr_hbm = Trainer(cfg)
    tr_str = Trainer(cfg_stream)
    h1 = tr_hbm.fit(tuples[:24], tuples[24:32], epochs=2, log_every=0)
    h2 = tr_str.fit(tuples[:24], tuples[24:32], epochs=2, log_every=0)
    np.testing.assert_allclose(h1[-1]["loss_G"], h2[-1]["loss_G"], rtol=1e-6)
    a = jax.tree.leaves(tr_hbm.state.params)
    b = jax.tree.leaves(tr_str.state.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_device_flip_aug_matches_host_flip(tiny_setup):
    """Training over the virtual 4x index space with on-device flips is
    numerically identical to training on the host-flip-augmented array
    (same shuffle stream → same batches → same updates)."""
    import dataclasses

    import jax

    from opticalflowscivis_tpu.data import flip_augment

    cfg, tuples = tiny_setup
    base = tuples[:8]
    hosted = flip_augment(base.reshape((-1,) + base.shape[2:])).reshape(
        (-1,) + base.shape[1:]
    )
    # reshape trick: flip_augment on [N*slots,*S,C] keeps tuple structure
    cfg_dev = dataclasses.replace(cfg, device_flip_aug=True)
    tr_dev = Trainer(cfg_dev)
    tr_host = Trainer(cfg)
    h1 = tr_dev.fit(base, tuples[24:32], epochs=1, log_every=0)
    h2 = tr_host.fit(hosted, tuples[24:32], epochs=1, log_every=0)
    assert tr_dev.steps_per_epoch == tr_host.steps_per_epoch
    np.testing.assert_allclose(h1[-1]["loss_G"], h2[-1]["loss_G"], rtol=1e-6)
    for x, y in zip(jax.tree.leaves(tr_dev.state.params),
                    jax.tree.leaves(tr_host.state.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_empty_val_split_falls_back_to_train_batch(tiny_setup):
    """Tiny series can yield an empty val split; fit must still run its
    per-epoch eval/checkpoint logic (falls back to a train batch)."""
    cfg, tuples = tiny_setup
    tr = Trainer(cfg)
    empty = tuples[:0]
    hist = tr.fit(tuples[:16], empty, epochs=1, log_every=0)
    assert hist and np.isfinite(hist[-1]["loss_G"])


def test_device_flip_streaming_fallback_matches_host(tiny_setup):
    """When the HBM cache is disabled, device_flip_aug falls back to
    materializing the host augmentation — must reshape tuple slots correctly
    (regression: flipping the 5-D tuple array mirrored the slots axis)."""
    import dataclasses

    import jax

    from opticalflowscivis_tpu.data import flip_augment

    cfg, tuples = tiny_setup
    base = tuples[:8]
    hosted = flip_augment(base.reshape((-1,) + base.shape[2:])).reshape(
        (-1,) + base.shape[1:]
    )
    cfg_fb = dataclasses.replace(cfg, device_flip_aug=True, hbm_dataset_gb=0.0)
    tr_fb = Trainer(cfg_fb)
    tr_host = Trainer(dataclasses.replace(cfg, hbm_dataset_gb=0.0))
    h1 = tr_fb.fit(base, tuples[24:32], epochs=1, log_every=0)
    h2 = tr_host.fit(hosted, tuples[24:32], epochs=1, log_every=0)
    np.testing.assert_allclose(h1[-1]["loss_G"], h2[-1]["loss_G"], rtol=1e-6)
    for x, y in zip(jax.tree.leaves(tr_fb.state.params),
                    jax.tree.leaves(tr_host.state.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_gt_flow_scale_threads_into_supervision(tiny_setup):
    """make_train_step(gt_flow_scale=k) scales the supervision target — the
    lbs2d velocity-vs-displacement unit fix (registry gt_flow_stride)."""
    import jax.numpy as jnp

    from opticalflowscivis_tpu.training.trainer import (
        build_model,
        make_train_step,
    )

    cfg, tuples = tiny_setup
    model = build_model(cfg)
    import jax

    batch = jnp.asarray(tuples[:2])
    img0 = batch[:, 0, ..., :1]
    params = model.init(jax.random.PRNGKey(0), img0, img0, img0)

    def eval_parts(scale):
        _, ev = make_train_step(model, cfg, has_flow=True, gt_flow_scale=scale)
        parts, _ = ev(
            __import__("flax").training.train_state.TrainState.create(
                apply_fn=model.apply, params=params,
                tx=__import__("optax").sgd(0.0)),
            batch,
        )
        return parts

    p1, p10 = eval_parts(1.0), eval_parts(10.0)
    # scaled GT flow must change the flow-supervision loss, nothing else wildly
    assert float(p10["loss_flow"]) != float(p1["loss_flow"])
    np.testing.assert_allclose(float(p10["loss_l1"]), float(p1["loss_l1"]),
                               rtol=1e-6)


def test_evaluate_covers_tail_batch(tiny_setup):
    """n_val not divisible by batch: the tail samples must contribute
    (regression: frames beyond the last full batch were silently dropped)."""
    cfg, tuples = tiny_setup
    tr = Trainer(cfg)
    tr.init_state(tuples[:8], total_steps=4)
    val = tuples[:12].copy()  # 8 + 4 tail with batch 8 (4 | 8: cycle-pad exact)
    full = tr.evaluate(val, 8)
    head_only = tr.evaluate(val[:8], 8)
    tail_only = tr.evaluate(val[8:], 8)
    # weighted combination of disjoint chunk means must reproduce `full`
    for k in full:
        np.testing.assert_allclose(
            full[k], (8 * head_only[k] + 4 * tail_only[k]) / 12, rtol=1e-4,
            err_msg=k,
        )
    # and the tail must actually matter
    assert any(
        not np.isclose(full[k], head_only[k], rtol=1e-6) for k in full
    )
