"""Self-supervision transform tests — affine equivariance properties."""

import jax
import jax.numpy as jnp
import numpy as np

from opticalflowscivis_tpu.losses.selfsup import (
    SPTransformConfig,
    apply_affine,
    eq_loss,
    sp_transform_pair,
    transform_flow,
)


def test_identity_affine_is_noop():
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    theta = jnp.zeros(2)
    zoom = jnp.ones(2)
    trans = jnp.zeros((2, 2))
    out = apply_affine(img, theta, zoom, trans)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_translation_shifts_content():
    img = jnp.zeros((1, 16, 16, 1)).at[:, 4, 4].set(1.0)
    out = apply_affine(img, jnp.zeros(1), jnp.ones(1),
                       jnp.asarray([[2 / 16, 0.0]]))  # ty = 2 px
    # pull-back: output pixel p samples input at p + t → peak moves to row 2
    assert float(out[0, 2, 4, 0]) > 0.9


def test_flow_equivariance_zero_flow():
    """Zero flow transforms to zero flow for any affine."""
    flow = jnp.zeros((2, 16, 16, 2))
    key = jax.random.PRNGKey(1)
    theta, zoom, trans = (
        jax.random.uniform(key, (2,), minval=-0.3, maxval=0.3),
        jax.random.uniform(key, (2,), minval=0.9, maxval=1.1),
        jnp.zeros((2, 2)),
    )
    out = transform_flow(flow, theta, zoom, trans)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)


def test_eq_loss_zero_for_consistent_flows():
    """If the student equals the transformed teacher, eq_loss hits its floor."""
    key = jax.random.PRNGKey(2)
    teacher = jax.random.normal(key, (1, 16, 16, 2))
    theta = jnp.asarray([0.2])
    zoom = jnp.asarray([1.05])
    trans = jnp.zeros((1, 2))
    student = transform_flow(teacher, theta, zoom, trans)
    val = eq_loss(student, teacher, (theta, zoom, trans))
    # abs_robust has a floor of 0.01**0.4 at zero error
    assert float(val) <= 0.01**0.4 + 1e-4


def test_sp_transform_pair_shapes():
    key = jax.random.PRNGKey(3)
    im = jax.random.uniform(key, (2, 16, 16, 3))
    t1, t2, params = sp_transform_pair(key, im, im, SPTransformConfig())
    assert t1.shape == im.shape and t2.shape == im.shape
    assert params[0].shape == (2,)
