"""Device-side synthetic volume generation — fresh tuples at zero upload cost.

A rectangle dataset's frames are fully determined by a tiny integer box
trajectory (``synthetic._box_trajectory``).  At 192³-256³ the *frames* are
the expensive object (28-67 MB each), not the trajectory: the round-3 192³
training run could hold only ~8 tuples after the relay-bound HBM upload and
memorized them.  Generating frames ON the TPU from positions — a box mask is
three broadcasted-iota range tests ANDed together — makes a fresh training
tuple cost 36 bytes of host→device traffic instead of ~85-200 MB, turning the
HBM-resident dataset into an unbounded stream of unique samples.

Reference parity: for the same trajectory the generated frames equal
``synthetic.rectangle_3d(with_flow=False)`` (⇔ Datasets/create_data_3d.py:
41-138, untextured constant-1 box) — oracle-tested in
``tests/test_device_synthetic.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from opticalflowscivis_tpu.data.synthetic import _box_trajectory


def box_density_device(
    pos: jax.Array, grid: tuple[int, ...], box: tuple[int, ...]
) -> jax.Array:
    """Constant-1 box density from integer corner positions, on device.

    ``pos [..., ndim] int32`` → ``[..., *grid, 1] float32`` — each leading
    index stamps one frame: 1.0 where ``pos[a] <= axis_a < pos[a]+box[a]``
    for every spatial axis, 0 elsewhere (create_data_3d.py:41-138's box).
    """
    nd = len(grid)
    mask = None
    for a in range(nd):
        i = jax.lax.broadcasted_iota(jnp.int32, grid, a)
        p = pos[..., a].reshape(pos.shape[:-1] + (1,) * nd)
        m = (i >= p) & (i < p + box[a])
        mask = m if mask is None else mask & m
    return mask.astype(jnp.float32)[..., None]


def tuple_positions(
    rng: np.random.Generator,
    n_tuples: int,
    grid: tuple[int, ...],
    box: tuple[int, ...],
    vel_max: int = 8,
    max_seq: int = 10,
) -> np.ndarray:
    """Host-side: ``[N, 3, ndim] int32`` box corners for (img0, img1, gt).

    Slot order matches ``pipeline.group_tuples(..., exp=1)``: tuple ``k``
    takes trajectory frames ``(3k, 3k+2, 3k+1)`` — so a device-generated
    epoch is sample-for-sample the same distribution as grouping a host
    ``rectangle_3d`` export, just with a fresh trajectory every call.
    """
    traj = _box_trajectory(rng, 3 * n_tuples, grid, box, vel_max, max_seq)
    k = np.arange(n_tuples) * 3
    return np.stack([traj[k], traj[k + 2], traj[k + 1]], axis=1).astype(
        np.int32
    )
