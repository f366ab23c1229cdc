"""Parallelism tests — halo exchange, spatially-sharded 3-D training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from opticalflowscivis_tpu.parallel import make_mesh
from opticalflowscivis_tpu.parallel.spatial import halo_exchange, volume_batch_sharding


def test_halo_exchange_matches_edge_pad():
    """Sharded halo exchange == edge-pad of the full array, per shard."""
    mesh = make_mesh(n_data=1, n_space=8)
    halo = 2
    full = jnp.arange(8 * 4 * 3, dtype=jnp.float32).reshape(8 * 4, 3)

    def f(x):
        return halo_exchange(x, "space", halo, dim=0)

    out = jax.jit(
        shard_map(
            f, mesh=mesh, in_specs=P("space", None), out_specs=P("space", None)
        )
    )(full)
    # shard i of the output must equal rows [4i-2, 4i+6) of the edge-padded full
    padded = jnp.concatenate([full[:halo], full, full[-halo:]])
    out_np = np.asarray(out).reshape(8, 4 + 2 * halo, 3)
    for i in range(8):
        np.testing.assert_allclose(out_np[i], np.asarray(padded[4 * i : 4 * i + 8]))


@pytest.mark.parametrize("padding", ["border", "zeros"])
def test_backward_warp3d_sharded_matches_unsharded(padding):
    """Depth-sharded slab warp == unsharded slab warp == direct gather warp."""
    from opticalflowscivis_tpu.ops.warp import backward_warp, backward_warp3d_slab
    from opticalflowscivis_tpu.parallel.spatial import backward_warp3d_sharded

    mesh = make_mesh(n_data=2, n_space=4)
    r_z = 3
    b, z, y, x, c = 2, 16, 12, 10, 2  # z_local = 4 >= r_z + 1
    key = jax.random.PRNGKey(7)
    img = jax.random.uniform(key, (b, z, y, x, c), jnp.float32)
    # flow_z within ±r_z (exactness domain), in-plane unrestricted
    flow = jax.random.uniform(
        jax.random.fold_in(key, 1), (b, z, y, x, 3), jnp.float32, -3.0, 3.0
    )

    ref = backward_warp(img, flow, padding=padding)
    slab = backward_warp3d_slab(img, flow, r_z=r_z, padding=padding)
    sharded = backward_warp3d_sharded(img, flow, mesh, r_z=r_z, padding=padding)
    np.testing.assert_allclose(np.asarray(slab), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(slab), atol=2e-5)


def test_backward_warp3d_sharded_grads():
    """The halo exchange differentiates (ppermute transpose): grads match."""
    from opticalflowscivis_tpu.ops.warp import backward_warp3d_slab
    from opticalflowscivis_tpu.parallel.spatial import backward_warp3d_sharded

    mesh = make_mesh(n_data=1, n_space=4)
    r_z = 2
    key = jax.random.PRNGKey(3)
    img = jax.random.uniform(key, (1, 12, 8, 8, 1), jnp.float32)
    flow = jax.random.uniform(
        jax.random.fold_in(key, 1), (1, 12, 8, 8, 3), jnp.float32, -1.5, 1.5
    )
    tgt = jax.random.uniform(jax.random.fold_in(key, 2), img.shape, jnp.float32)

    def loss_sharded(im, fl):
        return jnp.mean((backward_warp3d_sharded(im, fl, mesh, r_z=r_z) - tgt) ** 2)

    def loss_slab(im, fl):
        return jnp.mean((backward_warp3d_slab(im, fl, r_z=r_z) - tgt) ** 2)

    g_sh = jax.grad(loss_sharded, argnums=(0, 1))(img, flow)
    g_sl = jax.grad(loss_slab, argnums=(0, 1))(img, flow)
    for a, b in zip(g_sh, g_sl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_spatially_sharded_3d_train_step():
    """Full 3-D train step with the volume depth sharded over 4 devices."""
    from opticalflowscivis_tpu.data import group_tuples, rectangle_3d
    from opticalflowscivis_tpu.losses.rife import RIFELossWeights
    from opticalflowscivis_tpu.training import ModelConfig, TrainConfig, Trainer

    cfg = TrainConfig(
        dataset="rectangle3d",
        batch_size=2,
        n_data=2,
        n_space=4,
        spatial_shard=True,
        model=ModelConfig(ndim=3, block_channels=(8, 8, 8), teacher_channels=8,
                          conv0_kernel=3, bfloat16=False),
        loss=RIFELossWeights.preset_3d(),
        data_dir="/tmp/sp_data", log_dir="/tmp/sp_log", results_dir="/tmp/sp_res",
    )
    tr = Trainer(cfg)
    assert tr.mesh.shape == {"data": 2, "space": 4}
    arr = rectangle_3d(n_frames=6, grid=(16, 16, 16), box=(6, 6, 6), seed=0)
    tuples = group_tuples(arr, 1).astype(np.float32)
    tuples = np.tile(tuples, (1, 1, 1, 1, 1, 1))
    tr.init_state(tuples[:2], total_steps=4)
    batch = jax.device_put(jnp.asarray(tuples[:2]), tr.batch_sharding)
    state, parts = tr._jit_train(tr.state, batch)
    assert np.isfinite(float(parts["loss_G"]))


def test_multihost_initialize_paths(monkeypatch):
    """initialize_multihost: auto path falls back gracefully single-process;
    explicit path forwards coordinator args to jax.distributed.initialize."""
    from opticalflowscivis_tpu.parallel import multihost

    calls = {}

    def fake_init(**kw):
        calls.update(kw or {"auto": True})
        if not kw:
            raise RuntimeError("single process")

    monkeypatch.setattr(multihost.jax.distributed, "initialize", fake_init)
    out = multihost.initialize_multihost()
    assert out["initialized"] is False and out["process_count"] == 1
    assert out["n_devices"] == 8

    out = multihost.initialize_multihost(
        coordinator_address="10.0.0.1:1234", num_processes=2, process_id=0
    )
    assert out["initialized"] is True
    assert calls["coordinator_address"] == "10.0.0.1:1234"
    assert calls["num_processes"] == 2
