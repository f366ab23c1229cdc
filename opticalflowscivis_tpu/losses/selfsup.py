"""Self-supervised spatial-transform distillation (ARFlow / UPFlow ex_runner).

Re-design of ``tools.SP_transform.RandomAffineFlow`` (UPFlow/utils/tools.py:
802-1187) and the eq/oi losses of ``UPFlow/scripts/ex_runner.py``:

- a random affine transform T (rotation, isotropic zoom, translation) plus
  appearance noise is applied to the frame pair;
- the *teacher* flow comes from the un-transformed pair (stop-gradient);
- the *student* runs on the transformed pair, and ``eq_loss`` penalizes
  |student_flow - T(teacher_flow)| (transform-equivariance distillation);
- ``oi_loss`` is the occlusion-aware photometric loss on the transformed pair
  (appearance-transform robustness).

Everything is pure jax: affine sampling reuses ``ops.multilinear_sample``, and
flow vectors are rotated/scaled by the affine's linear part.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from opticalflowscivis_tpu.losses.upflow import photo_loss_multi_type
from opticalflowscivis_tpu.ops import multilinear_sample, occ_check


@dataclasses.dataclass(frozen=True)
class SPTransformConfig:
    max_rotate_deg: float = 10.0
    min_zoom: float = 0.9
    max_zoom: float = 1.1
    max_translate: float = 0.1  # fraction of image size
    noise_std: float = 0.02
    add_noise: bool = True


def random_affine_params(key: jax.Array, batch: int, cfg: SPTransformConfig):
    """Per-item (theta, zoom, (ty, tx)) draws."""
    k1, k2, k3 = jax.random.split(key, 3)
    theta = jax.random.uniform(
        k1, (batch,), minval=-cfg.max_rotate_deg, maxval=cfg.max_rotate_deg
    ) * (jnp.pi / 180.0)
    zoom = jax.random.uniform(k2, (batch,), minval=cfg.min_zoom, maxval=cfg.max_zoom)
    trans = jax.random.uniform(
        k3, (batch, 2), minval=-cfg.max_translate, maxval=cfg.max_translate
    )
    return theta, zoom, trans


def _affine_matrix(theta, zoom):
    """Inverse-map linear part (output coord → input coord), row-major (y, x)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    # rotate by -theta and scale by 1/zoom (pull-back)
    return jnp.stack(
        [jnp.stack([c, s], -1), jnp.stack([-s, c], -1)], -2
    ) / zoom[:, None, None]


def apply_affine(img: jax.Array, theta, zoom, trans) -> jax.Array:
    """Warp ``[B, H, W, C]`` by the affine (about the image center)."""
    b, h, w, _ = img.shape
    mat = _affine_matrix(theta, zoom)  # [B, 2, 2]
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - (h - 1) / 2
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - (w - 1) / 2
    grid = jnp.stack([yy, xx], -1)  # [H, W, 2] centered output coords
    src = jnp.einsum("bij,hwj->bhwi", mat, grid)
    center = jnp.asarray([(h - 1) / 2, (w - 1) / 2], jnp.float32)
    shift = trans * jnp.asarray([h, w], jnp.float32)
    coords = src + center[None, None, None] + shift[:, None, None, :]
    return multilinear_sample(img, coords, padding="border")


def transform_flow(flow: jax.Array, theta, zoom, trans) -> jax.Array:
    """Pull the flow field through the affine and rotate/scale the vectors.

    For T(p) = A p + t (input coords from output coords), the equivariant flow
    satisfies flow'(p_out) = A^{-1} flow(T(p_out)); with A = R(-θ)/z the inverse
    is z·R(θ).
    """
    warped = apply_affine(flow, theta, zoom, trans)
    c, s = jnp.cos(theta), jnp.sin(theta)
    inv = jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)
    inv = inv * zoom[:, None, None]
    return jnp.einsum("bij,bhwj->bhwi", inv, warped)


def sp_transform_pair(
    key: jax.Array, im1: jax.Array, im2: jax.Array, cfg: SPTransformConfig
):
    """Transform both frames consistently; returns (im1', im2', params)."""
    kp, kn = jax.random.split(key)
    theta, zoom, trans = random_affine_params(kp, im1.shape[0], cfg)
    t1 = apply_affine(im1, theta, zoom, trans)
    t2 = apply_affine(im2, theta, zoom, trans)
    if cfg.add_noise and cfg.noise_std > 0:
        t1 = t1 + cfg.noise_std * jax.random.normal(kn, t1.shape, t1.dtype)
        t2 = t2 + cfg.noise_std * jax.random.normal(
            jax.random.fold_in(kn, 1), t2.shape, t2.dtype
        )
    return t1, t2, (theta, zoom, trans)


def eq_loss(
    student_flow: jax.Array,
    teacher_flow: jax.Array,
    params,
    occ_mask: jax.Array | None = None,
) -> jax.Array:
    """Equivariance distillation: |flow(T(pair)) - T(stopgrad teacher flow)|."""
    theta, zoom, trans = params
    target = transform_flow(jax.lax.stop_gradient(teacher_flow), theta, zoom, trans)
    mask = (
        apply_affine(occ_mask, theta, zoom, trans) if occ_mask is not None else None
    )
    return photo_loss_multi_type(
        student_flow, target,
        mask if mask is not None else jnp.ones_like(student_flow[..., :1]),
        "abs_robust", use_occ=mask is not None,
    )


def oi_loss(
    im1_t: jax.Array, im2_t: jax.Array, flow_fw_t: jax.Array,
    flow_bw_t: jax.Array,
) -> jax.Array:
    """Occlusion-masked photometric loss on the transformed pair."""
    from opticalflowscivis_tpu.ops import backward_warp

    occ_fw, _ = occ_check(flow_fw_t, flow_bw_t)
    warped = backward_warp(im2_t, flow_fw_t, padding="border")
    return photo_loss_multi_type(im1_t, warped, occ_fw, "abs_robust", use_occ=True)
