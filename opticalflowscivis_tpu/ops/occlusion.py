"""Forward-backward occlusion check.

Parity: UPFlow's ``occ_check_model`` with ``occ_type='for_back_check'``
(UPFlow/utils/tools.py:543-719): a pixel in frame 0 is visible iff

    |f_fw(p) + f_bw(p + f_fw(p))|^2  <=  alpha1 * (|f_fw|^2 + |f_bw_warped|^2) + alpha2

The returned masks are 1 where visible.  Zero flow everywhere => all visible.
The reference's ``out_occ`` variant additionally marks out-of-bounds targets
occluded; we get that by warping with zeros padding and counting the sampling
validity mask (enabled via ``bound_check=True``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from opticalflowscivis_tpu.ops.warp import backward_warp


def _sq_norm(x: jax.Array) -> jax.Array:
    return jnp.sum(x * x, axis=-1, keepdims=True)


@partial(jax.jit, static_argnames=("bound_check",))
def occ_check(
    flow_fw: jax.Array,
    flow_bw: jax.Array,
    alpha1: float = 0.1,
    alpha2: float = 0.5,
    bound_check: bool = False,
):
    """Return (visible_mask_fw, visible_mask_bw), each ``[B, *S, 1]`` in {0,1}."""

    def one_direction(fa, fb):
        fb_warped, valid = backward_warp(fb, fa, padding="zeros", return_mask=True)
        diff = fa + fb_warped
        thresh = alpha1 * (_sq_norm(fa) + _sq_norm(fb_warped)) + alpha2
        vis = (_sq_norm(diff) <= thresh).astype(fa.dtype)
        if bound_check:
            vis = vis * (valid > 0.999).astype(fa.dtype)
        return vis

    return one_direction(flow_fw, flow_bw), one_direction(flow_bw, flow_fw)
