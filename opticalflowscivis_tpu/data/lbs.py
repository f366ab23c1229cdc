"""Lattice-Boltzmann D2Q9 simulation — flow past a cylinder (lbs2d dataset).

Re-implementation of ``Datasets/LatticeBoltzmannSim/latticeboltzmann.py`` as a
jitted ``lax.scan`` (the reference is a 33 000-iteration Python loop with numpy
roll/boolean indexing, :36-109).  Physics parity:

- 400x100 grid, rho0=100, tau=0.6, Nt=33000, sample every 10th step after
  skipping the first 3000 (":36-40, :113-118");
- D2Q9 velocities/weights (":45-48"), rightward initial drive on channel 3 with
  a 4-period cosine perturbation + noise (":51-58");
- cylinder radius Ny/4 at (Nx/4, Ny/2) with full bounce-back (":61-62, :83,
  :109") — expressed as a reflectivity ``where`` instead of boolean writes;
- the exported stack is (density, ux, uy) per kept step like ``lbs2d_skip_.pkl``
  (SURVEY.md L0), in this framework's layout ``[T, H, W, 3]`` with flow channels
  row-major (uy, ux) ≡ (d_axis0, d_axis1).
"""

from __future__ import annotations

import numpy as np

# D2Q9: (cx, cy) per channel, reference order (latticeboltzmann.py:46-47)
_CXS = np.array([0, 0, 1, 1, 1, 0, -1, -1, -1])
_CYS = np.array([0, 1, 1, 0, -1, -1, -1, 0, 1])
_W = np.array([4 / 9, 1 / 9, 1 / 36, 1 / 9, 1 / 36, 1 / 9, 1 / 36, 1 / 9, 1 / 36])
# bounce-back: opposite channel index for each of the 9 directions
_OPP = np.array([0, 5, 6, 7, 8, 1, 2, 3, 4])


def lattice_boltzmann_2d(
    nx: int = 400,
    ny: int = 100,
    n_steps: int = 33000,
    skip: int = 3000,
    sample_every: int = 10,
    rho0: float = 100.0,
    tau: float = 0.6,
    seed: int = 42,
    inflow_u: float = 0.0,
) -> np.ndarray:
    """Run the simulation; returns ``[T, ny, nx, 3]`` (density, uy, ux) float32.

    ``inflow_u > 0`` adds a sustained velocity inlet on the left column
    (equilibrium populations at (rho0, inflow_u)) and a zero-gradient outflow
    on the right.  The reference sim has only an initial kick and its wake
    decays over the run (measured: per-frame change drops 50x by step 60000);
    its headline pipedcylinder2d NetCDF data, by contrast, comes from a CFD
    solver with sustained inflow — this option makes the generated analogue
    match that regime (used by the vortex2d registry entry).
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    F = np.ones((ny, nx, 9)) + 0.01 * rng.standard_normal((ny, nx, 9))
    X = np.arange(nx)[None, :].repeat(ny, 0)
    F[:, :, 3] += 2 * (1 + 0.2 * np.cos(2 * np.pi * X / nx * 4))
    rho = F.sum(-1, keepdims=True)
    F *= rho0 / rho

    Y = np.arange(ny)[:, None].repeat(nx, 1)
    cylinder = ((X - nx / 4) ** 2 + (Y - ny / 2) ** 2) < (ny / 4) ** 2

    cxs = jnp.asarray(_CXS)
    cys = jnp.asarray(_CYS)
    w = jnp.asarray(_W, jnp.float32)
    cyl = jnp.asarray(cylinder)

    def step_only(F, _):
        F, _out = step(F, None)
        return F, None

    def step(F, _):
        # Drift: roll each channel by its lattice velocity.
        F = jnp.stack(
            [
                jnp.roll(F[:, :, i], (int(_CYS[i]), int(_CXS[i])), axis=(0, 1))
                for i in range(9)
            ],
            axis=-1,
        )
        # Bounce-back inside the cylinder (reflect populations).
        bndry = F[..., _OPP]
        rho = jnp.sum(F, axis=-1)
        ux = jnp.sum(F * cxs, axis=-1) / rho
        uy = jnp.sum(F * cys, axis=-1) / rho
        cu = (
            cxs[None, None] * ux[..., None] + cys[None, None] * uy[..., None]
        )
        Feq = (
            rho[..., None]
            * w[None, None]
            * (1 + 3 * cu + 9 * cu**2 / 2 - 3 * (ux**2 + uy**2)[..., None] / 2)
        )
        F = F - (1.0 / tau) * (F - Feq)
        F = jnp.where(cyl[..., None], bndry, F)
        if inflow_u:
            # velocity inlet: equilibrium populations at (rho0, inflow_u);
            # outflow: zero-gradient copy of the second-to-last column
            cu_in = 3.0 * cxs * inflow_u
            feq_in = rho0 * w * (1 + cu_in + cu_in**2 / 2 - 1.5 * inflow_u**2)
            F = F.at[:, 0, :].set(feq_in[None, :])
            F = F.at[:, -1, :].set(F[:, -2, :])
        ux = jnp.where(cyl, 0.0, ux)
        uy = jnp.where(cyl, 0.0, uy)
        out = jnp.stack([rho, uy, ux], axis=-1)  # row-major flow channels
        return F, out

    n_keep = (n_steps - skip) // sample_every

    @jax.jit
    def run(F):
        # burn-in without materializing outputs, then emit one state per
        # ``sample_every`` inner steps — keeps memory at [n_keep, ny, nx, 3].
        F, _ = jax.lax.scan(step_only, F, None, length=skip)

        def outer(F, _):
            F, out = step(F, None)
            F, _ = jax.lax.scan(step_only, F, None, length=sample_every - 1)
            return F, out

        return jax.lax.scan(outer, F, None, length=n_keep)

    _, states = run(jnp.asarray(F, jnp.float32))
    kept = np.array(states, np.float32)  # copy: jax buffers are read-only
    # normalize density to [0, 1] for the scalar channel (loader parity)
    d = kept[..., 0]
    kept[..., 0] = (d - d.min()) / max(d.max() - d.min(), 1e-9)
    return kept
