"""IFNet model tests — shapes, teacher branch, inference mode, rank-genericity."""

import jax
import jax.numpy as jnp
import pytest

from opticalflowscivis_tpu.models import IFNet


def tiny_net(ndim=2, **kw):
    return IFNet(
        ndim=ndim,
        block_channels=(16, 12, 8),
        teacher_channels=8,
        conv0_kernel=3,
        **kw,
    )


@pytest.fixture(scope="module")
def net2d_and_params():
    net = tiny_net()
    x = jnp.zeros((2, 32, 32, 1))
    params = net.init(jax.random.PRNGKey(0), x, x, x)
    return net, params


def test_forward_shapes_2d(net2d_and_params):
    net, params = net2d_and_params
    k = jax.random.PRNGKey(1)
    img0 = jax.random.uniform(k, (2, 32, 32, 1))
    img1 = jax.random.uniform(jax.random.fold_in(k, 1), (2, 32, 32, 1))
    gt = jax.random.uniform(jax.random.fold_in(k, 2), (2, 32, 32, 1))
    out = net.apply(params, img0, img1, gt)
    assert len(out["merged"]) == 3
    for m, f, mk in zip(out["merged"], out["flow_list"], out["mask_list"]):
        assert m.shape == (2, 32, 32, 1)
        assert f.shape == (2, 32, 32, 4)
        assert mk.shape == (2, 32, 32, 1)
        assert float(mk.min()) >= 0.0 and float(mk.max()) <= 1.0
    assert out["flow_teacher"].shape == (2, 32, 32, 4)
    assert out["merged_teacher"].shape == (2, 32, 32, 1)
    assert jnp.isfinite(out["loss_distill"])


def test_inference_without_gt(net2d_and_params):
    """gt=None (inference) must skip the teacher and reuse the same params."""
    net, params = net2d_and_params
    img = jnp.ones((1, 32, 32, 1)) * 0.5
    out = net.apply(params, img, img, None)
    assert out["flow_teacher"] is None
    assert out["merged_teacher"] is None
    assert out["merged"][-1].shape == (1, 32, 32, 1)
    # identical frames: prediction should be close to the inputs
    assert float(jnp.abs(out["merged"][-1] - img).mean()) < 0.2


def test_teacher_params_unused_at_inference(net2d_and_params):
    """Param tree contains the teacher block; student path must not need it."""
    net, params = net2d_and_params
    keys = params["params"].keys()
    assert "block_tea" in keys and "block0" in keys


def test_forward_shapes_3d():
    net = tiny_net(ndim=3)
    x = jnp.zeros((1, 16, 16, 16, 1))
    params = net.init(jax.random.PRNGKey(0), x, x, x)
    out = net.apply(params, x, x, x)
    assert out["merged"][-1].shape == (1, 16, 16, 16, 1)
    assert out["flow_list"][-1].shape == (1, 16, 16, 16, 6)


def test_arbitrary_timestep():
    net = tiny_net(arbitrary_timestep=True)
    x = jnp.zeros((1, 32, 32, 1))
    params = net.init(jax.random.PRNGKey(0), x, x, None)
    o1 = net.apply(params, x, x, None, timestep=0.25)
    o2 = net.apply(params, x, x, None, timestep=0.75)
    assert o1["merged"][-1].shape == o2["merged"][-1].shape


def test_distill_loss_nonzero_without_refine():
    """Regression: the per-block distillation loss (IFNet.py:239-248) must be
    computed for every student block regardless of the refine flag — it was
    silently 0.0 when refine=False."""
    import jax
    import jax.numpy as jnp

    from opticalflowscivis_tpu.models import IFNet

    net = IFNet(ndim=2, block_channels=(16, 12, 8), teacher_channels=8,
                refine=False)
    k = jax.random.PRNGKey(3)
    img0 = jax.random.uniform(k, (2, 32, 32, 1))
    img1 = jax.random.uniform(jax.random.fold_in(k, 1), (2, 32, 32, 1))
    gt = jax.random.uniform(jax.random.fold_in(k, 2), (2, 32, 32, 1))
    params = net.init(jax.random.PRNGKey(0), img0, img1, gt)
    out = net.apply(params, img0, img1, gt)
    assert float(out["loss_distill"]) > 0.0


def test_distill_gradients_finite_when_flows_coincide():
    """Regression: √(mean(Δflow²)) has an infinite gradient at Δ=0 — the
    distill RMSE needs an eps so coinciding student/teacher flow pixels
    (common in bf16) don't NaN the whole gradient."""
    import jax
    import jax.numpy as jnp

    from opticalflowscivis_tpu.models import IFNet

    net = IFNet(ndim=2, block_channels=(16, 12, 8), teacher_channels=8)
    k = jax.random.PRNGKey(1)
    img0 = jax.random.uniform(k, (1, 32, 32, 1))
    # identical inputs → all blocks predict (near-)zero flow → Δflow ≈ 0
    params = net.init(k, img0, img0, img0)

    def distill(p):
        return net.apply(p, img0, img0, img0)["loss_distill"]

    g = jax.grad(distill)(params)
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))


def test_flow_leash_penalizes_escaped_flows():
    """flow_leash: zero inside the warp radius, positive + differentiable for
    flows beyond it (the bounded-warp collapse stabilizer)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from opticalflowscivis_tpu.losses.rife import RIFELossWeights, rife_losses

    w = dataclasses.replace(RIFELossWeights.preset_3d(),
                            flow_leash=1.0, flow_leash_radius=8.0)

    def fake_outputs(mag):
        f = jnp.full((1, 4, 4, 4, 6), mag, jnp.float32)
        m = jnp.zeros((1, 4, 4, 4, 1))
        return {
            "flow_list": [f, f, f], "mask_list": [m, m, m],
            "merged": [m, m, m], "flow_teacher": f, "merged_teacher": m,
            "loss_distill": jnp.zeros(()),
        }

    img = jnp.zeros((1, 4, 4, 4, 1))
    _, p_in = rife_losses(fake_outputs(3.0), img, img, img, {}, w, 3)
    _, p_out = rife_losses(fake_outputs(12.0), img, img, img, {}, w, 3)
    assert float(p_in["loss_leash"]) == 0.0
    assert float(p_out["loss_leash"]) > 0.0

    def leash(mag):
        return rife_losses(fake_outputs(mag), img, img, img, {}, w, 3)[1][
            "loss_leash"
        ]

    g = jax.grad(lambda m: leash(m))(12.0)
    assert float(g) > 0.0  # live gradient pulls escaped flows back
