"""Pallas kernel tests — interpret-mode equality with the jnp oracle on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from opticalflowscivis_tpu.ops.correlation import _cost_volume_jnp, cost_volume
from opticalflowscivis_tpu.ops.pallas.correlation import (
    cost_volume_pallas,
    pallas_cost_volume_supported,
)


def test_supported_predicate(monkeypatch):
    # Default gate is 16384 px (measured: XLA wins at the decode-level
    # planes, scripts/pallas_gate_ab2.py) — 64x208 = 13312 is below it.
    assert not pallas_cost_volume_supported((4, 64, 208, 32), 4)
    assert pallas_cost_volume_supported((4, 256, 832, 32), 4)
    monkeypatch.setenv("OFS_PALLAS_CORR_MIN_HW", "0")
    assert pallas_cost_volume_supported((4, 64, 208, 32), 4)
    assert not pallas_cost_volume_supported((1, 16, 16, 16, 8), 4)  # 3-D → jnp


def test_pallas_matches_jnp_interpret():
    k = jax.random.PRNGKey(0)
    f1 = jax.random.normal(k, (2, 16, 24, 8), jnp.float32)
    f2 = jax.random.normal(jax.random.fold_in(k, 1), (2, 16, 24, 8), jnp.float32)
    ref = _cost_volume_jnp(f1, f2, 2)
    with pltpu.force_tpu_interpret_mode():
        out = cost_volume_pallas(f1, f2, 2)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


def test_pallas_grads_match_jnp_interpret():
    k = jax.random.PRNGKey(3)
    f1 = jax.random.normal(k, (1, 8, 16, 4), jnp.float32)
    f2 = jax.random.normal(jax.random.fold_in(k, 1), (1, 8, 16, 4), jnp.float32)

    def loss_ref(a, b):
        return jnp.sum(_cost_volume_jnp(a, b, 2) ** 2)

    def loss_pal(a, b):
        return jnp.sum(cost_volume_pallas(a, b, 2) ** 2)

    g1r, g2r = jax.grad(loss_ref, (0, 1))(f1, f2)
    with pltpu.force_tpu_interpret_mode():
        g1p, g2p = jax.grad(loss_pal, (0, 1))(f1, f2)
    np.testing.assert_allclose(np.asarray(g1r), np.asarray(g1p), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g2r), np.asarray(g2p), atol=1e-4)


def test_dispatcher_uses_jnp_on_cpu():
    """On CPU the auto backend must use the jnp path (no TPU available)."""
    k = jax.random.PRNGKey(1)
    f1 = jax.random.normal(k, (1, 16, 16, 4), jnp.float32)
    out = cost_volume(f1, f1, max_disp=2, backend="auto")
    ref = _cost_volume_jnp(f1, f1, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
