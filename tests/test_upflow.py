"""UPFlow tests — forward shapes, loss composition, tiny training run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opticalflowscivis_tpu.losses import UPFlowLossConfig, upflow_losses
from opticalflowscivis_tpu.models import UPFlowConfig, UPFlowNet
from opticalflowscivis_tpu.training.upflow_trainer import (
    UPFlowTrainConfig,
    UPFlowTrainer,
    frames_to_pairs,
)

TINY = UPFlowConfig(
    num_chs=(3, 4, 8, 8, 12, 16, 16),
    estimator_f_channels=(16, 16, 12, 8, 8),
    context_f_channels=(16, 16, 16, 12, 8, 8, 2),
    search_range=2,
)


@pytest.fixture(scope="module")
def tiny_upflow():
    net = UPFlowNet(cfg=TINY)
    k = jax.random.PRNGKey(0)
    im1 = jax.random.uniform(k, (2, 64, 64, 3))
    im2 = jax.random.uniform(jax.random.fold_in(k, 1), (2, 64, 64, 3))
    params = net.init(k, im1, im2)
    return net, params, im1, im2


def test_forward_shapes(tiny_upflow):
    net, params, im1, im2 = tiny_upflow
    out = net.apply(params, im1, im2)
    assert out["flow_f"].shape == (2, 64, 64, 2)
    assert out["flow_b"].shape == (2, 64, 64, 2)
    assert len(out["flows"]) == 5
    # finest-first pyramid: level 0 is 1/4 resolution
    assert out["flows"][0][0].shape == (2, 16, 16, 2)


def test_losses_finite_and_composed(tiny_upflow):
    net, params, im1, im2 = tiny_upflow
    out = net.apply(params, im1, im2)
    cfg = UPFlowLossConfig(census_weight=0.5, msd_weight=0.01,
                           photo_loss_use_occ=True, stop_occ_gradient=True)
    total, parts = upflow_losses(out, im1, im2, cfg)
    for k, v in parts.items():
        assert np.isfinite(float(v)), k
    assert float(total) == pytest.approx(
        float(parts["photo_loss"] + parts["smooth_loss"]
              + parts["census_loss"] + parts["msd_loss"]), rel=1e-5
    )


def test_identical_frames_zero_flow_favored(tiny_upflow):
    """With im1 == im2, photometric loss of the predicted flow must not be worse
    than a tiny perturbation — sanity that the warp/loss plumbing is aligned."""
    net, params, im1, _ = tiny_upflow
    out = net.apply(params, im1, im1)
    _, parts = upflow_losses(out, im1, im1, UPFlowLossConfig())
    assert np.isfinite(float(parts["photo_loss"]))


def test_sgu_variant_runs():
    net = UPFlowNet(cfg=UPFlowConfig(
        num_chs=TINY.num_chs, estimator_f_channels=TINY.estimator_f_channels,
        context_f_channels=TINY.context_f_channels, search_range=2,
        if_sgu_upsample=True, if_norm_before_cost_volume=True))
    k = jax.random.PRNGKey(0)
    im = jax.random.uniform(k, (1, 64, 64, 3))
    params = net.init(k, im, im)
    out = net.apply(params, im, im)
    assert out["flow_f"].shape == (1, 64, 64, 2)


def test_sgu_sharpens_misplaced_motion_boundary():
    """Semantic test of the self-guided upsampler (upflow.py:21-93), not just
    shapes: a bilinearly-upsampled flow smears a motion boundary over 8 px and
    puts its midpoint at the wrong column; the guidance features carry the true
    edge.  SGU's warp-blend mechanism (interpolation-flow warp of the coarse
    flow + learned mask) must be ABLE to pull the boundary onto the feature
    edge — trained alone for a few hundred steps it has to beat the bilinear
    upsample's error by a wide margin.  A module that returned its input flow
    unchanged (the failure mode a shapes test cannot see) scores ratio = 1.0
    and fails."""
    import optax

    from opticalflowscivis_tpu.models.upflow import SGUModel

    H = W = 32
    edge_col = 13  # true motion boundary (off the 4x coarse grid on purpose)
    col = jnp.arange(W, dtype=jnp.float32)[None, :, None]
    sharp = jnp.where(col < edge_col, 2.0, 0.0) * jnp.ones((H, W, 1))
    gt = jnp.concatenate([sharp, jnp.zeros_like(sharp)], -1)[None]  # dy only
    # what a 4x bilinear upsample of the coarse flow looks like: an 8-px ramp
    # whose midpoint sits at col 16, i.e. blurred AND misplaced by 3 px
    ramp = jnp.clip((20.0 - col) / 8.0, 0.0, 1.0) * 2.0 * jnp.ones((H, W, 1))
    flow_init = jnp.concatenate([ramp, jnp.zeros_like(ramp)], -1)[None]
    # guidance features: the true edge, visible in both frames' features
    g = jnp.where(col < edge_col, 1.0, -1.0) * jnp.ones((H, W, 4))
    g1 = g2 = g[None]

    sgu = SGUModel()
    key = jax.random.PRNGKey(3)
    params = sgu.init(key, flow_init, g1, g2)

    def loss_fn(p):
        out = sgu.apply(p, flow_init, g1, g2)
        return jnp.mean(jnp.abs(out - gt))

    baseline = float(jnp.mean(jnp.abs(flow_init - gt)))  # identity/bilinear
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        grads = jax.grad(loss_fn)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o

    for _ in range(300):
        params, opt = step(params, opt)
    final = float(loss_fn(params))
    assert final < 0.5 * baseline, (
        f"SGU failed to move the boundary toward the guidance edge: "
        f"{final:.4f} vs bilinear {baseline:.4f}"
    )

    # output_level_flow path (the full-res call in UPFlowNet.__call__):
    # inter_flow/mask are predicted at guidance resolution, upsampled, and
    # applied to the full-res flow
    full = jnp.repeat(jnp.repeat(gt, 2, axis=1), 2, axis=2)
    out_full = sgu.apply(params, gt, g1, g2, output_level_flow=full)
    assert out_full.shape == full.shape
    assert bool(jnp.all(jnp.isfinite(out_full)))


def test_trainer_loss_decreases(tmp_path):
    from opticalflowscivis_tpu.data import rectangle_2d

    arr = rectangle_2d(n_frames=17, grid=(64, 64), box=(20, 24), seed=9)
    pairs = frames_to_pairs(arr[..., :1], in_channels=3)
    cfg = UPFlowTrainConfig(
        batch_size=8, bfloat16=False, exp_dir=str(tmp_path),
        model=TINY, pad_multiple=64,
        loss=UPFlowLossConfig(smooth_order_1_weight=0.1),
    )
    tr = UPFlowTrainer(cfg)
    hist = tr.fit(pairs, epochs=3, log_every=0)
    assert len(hist) == 3
    assert np.isfinite(hist[-1]["loss_total"])
    assert hist[-1]["loss_total"] <= hist[0]["loss_total"] * 1.05
    parts, extras = tr.predict(pairs[:8])
    assert extras["flow_f"].shape == (8, 64, 64, 2)


def test_ex_runner_preset_trains_one_epoch(tmp_path):
    """preset_ex_runner: eq/oi distillation + exponential-LR recipe
    (ex_runner.py:23-58) runs a tiny end-to-end epoch and decays the LR."""
    from opticalflowscivis_tpu.models.upflow import UPFlowConfig
    from opticalflowscivis_tpu.training.upflow_trainer import (
        UPFlowTrainConfig,
        UPFlowTrainer,
        frames_to_pairs,
    )

    cfg = UPFlowTrainConfig.preset_ex_runner(
        batch_size=2, n_epoch=1, exp_dir=str(tmp_path), pad_multiple=32,
        bfloat16=False,
        model=UPFlowConfig(
            num_chs=(3, 4, 8, 8, 12, 16, 16),
            estimator_f_channels=(16, 16, 12, 8, 8),
            context_f_channels=(16, 16, 16, 12, 8, 8, 2),
            search_range=2,
        ),
    )
    assert cfg.eq_weight == 0.01 and cfg.oi_weight == 0.01
    assert cfg.lr == 1e-2 and cfg.lr_gamma == 0.95
    rng = np.random.default_rng(0)
    frames = rng.uniform(size=(17, 32, 32, 1)).astype(np.float32)
    tr = UPFlowTrainer(cfg)
    hist = tr.fit(frames_to_pairs(frames, 3), epochs=1)
    assert hist and np.isfinite(hist[0]["loss_total"])
    assert "eq_loss" in hist[0] and "oi_loss" in hist[0]


def test_fit_logs_val_epe(tmp_path):
    """fit(val_pairs, val_flow) logs per-epoch val_epe + zero-flow baseline,
    including the fewer-val-pairs-than-devices tiling path (8-device mesh)."""
    import json

    cfg = UPFlowTrainConfig(
        batch_size=8, n_epoch=1, bfloat16=False, hbm_dataset_gb=0.0,
        exp_dir=str(tmp_path), pad_multiple=64, model=TINY,
    )
    tr = UPFlowTrainer(cfg)
    rng = np.random.default_rng(0)
    pairs = rng.uniform(size=(8, 2, 64, 64, 3)).astype(np.float32)
    val_pairs = pairs[:3]  # < 8 devices -> tiling path
    val_flow = np.zeros((3, 64, 64, 2), np.float32)
    hist = tr.fit(pairs, epochs=1, val_pairs=val_pairs, val_flow=val_flow)
    assert "val_epe" in hist[0] and np.isfinite(hist[0]["val_epe"])
    assert hist[0]["val_epe_zero_flow"] == 0.0
    logged = json.load(open(tmp_path / "loss.json"))["loss"][0]
    assert "val_epe" in logged


def test_train_config_defaults_cost_volume_norm():
    """Training default ⇔ simple_train.py param_dict (:321-329): cost-volume
    feature normalization ON, per-image/per-channel moments.  Without it the
    unsupervised losses cannot move flow (measured — see UPFlowTrainConfig
    docstring); UPFlowConfig itself keeps the UPFlow_net.config default."""
    cfg = UPFlowTrainConfig()
    assert cfg.model.if_norm_before_cost_volume
    assert not cfg.model.norm_moments_across_channels
    assert not cfg.model.norm_moments_across_images
    from opticalflowscivis_tpu.models import UPFlowConfig
    assert not UPFlowConfig().if_norm_before_cost_volume


def test_ex_runner_preset_accepts_lr_override():
    """ADVICE r2: an explicit lr must override the recipe's 1e-2 without a
    duplicate-kwarg TypeError (cli train_upflow --recipe ex_runner --lr)."""
    from opticalflowscivis_tpu.training.upflow_trainer import UPFlowTrainConfig

    cfg = UPFlowTrainConfig.preset_ex_runner(lr=5e-3, batch_size=2)
    assert cfg.lr == 5e-3 and cfg.lr_gamma == 0.95 and cfg.eq_weight == 0.01
    assert UPFlowTrainConfig.preset_ex_runner().lr == 1e-2


def test_batch_directions_equivalent_and_param_compatible():
    """The direction-batched decode (batch_directions=True, the default) is
    numerically equivalent to the two-stream reference layout and shares the
    exact parameter tree (checkpoints interchange).  Every subnet op is
    per-sample, so stacking fw/bw along batch changes scheduling only;
    tolerance is float noise (the coarsest 2x2 normalized level amplifies
    ulps through near-zero variances)."""
    import dataclasses

    k = jax.random.PRNGKey(2)
    im1 = jax.random.uniform(k, (2, 64, 64, 3))
    im2 = jax.random.uniform(jax.random.fold_in(k, 1), (2, 64, 64, 3))
    # Both moment configs: the shipped default (True/True — "across images"
    # means across the FRAME PAIR, still per-sample, so batching fw/bw must
    # not change it; ADVICE r4 asked this default to be exercised) and the
    # per-channel/per-image variant.
    for across in (True, False):
        base = dataclasses.replace(TINY, if_norm_before_cost_volume=True,
                                   norm_moments_across_channels=across,
                                   norm_moments_across_images=across)
        for sgu in (False, True):
            cfg_b = dataclasses.replace(base, batch_directions=True,
                                        if_sgu_upsample=sgu)
            cfg_u = dataclasses.replace(cfg_b, batch_directions=False)
            net_b, net_u = UPFlowNet(cfg=cfg_b), UPFlowNet(cfg=cfg_u)
            params = net_u.init(k, im1, im2)
            pb = net_b.init(k, im1, im2)
            assert (jax.tree_util.tree_structure(params)
                    == jax.tree_util.tree_structure(pb))
            out_u = net_u.apply(params, im1, im2)
            out_b = net_b.apply(params, im1, im2)
            for key in ("flow_f", "flow_b"):
                a = np.asarray(out_u[key])
                b = np.asarray(out_b[key])
                # atol is scaled by the GLOBAL magnitude: the across=True
                # moments config explodes to ~1e8 flows at this degenerate
                # tiny-random-init config (near-zero shared variance at the
                # 2x2 coarsest level), so float noise is proportional to
                # that global scale, not to each element's own value.
                np.testing.assert_allclose(
                    a, b, rtol=1e-4, atol=1e-3 + 1e-4 * abs(a).max(),
                )
