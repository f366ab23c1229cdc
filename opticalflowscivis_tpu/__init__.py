"""opticalflowscivis_tpu — TPU-native optical flow & temporal interpolation for SciVis data.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
HamidGadirov/OpticalFlowSciVis (reference mounted at /root/reference):

- RIFE-style student/teacher coarse-to-fine frame interpolation, dimension-generic
  over 2-D images and 3-D volumes (reference: Flow-2D/, Flow-3D/).
- UPFlow-style unsupervised pyramid optical flow with cost-volume correlation,
  occlusion reasoning and photometric/census/smoothness losses (reference: UPFlow/).
- Dataset toolbox: synthetic generators with ground-truth flow, converters,
  loaders (reference: Datasets/, */load_datasets.py).
- Training runtime: single jitted train step, data-parallel + spatial sharding over
  a jax.sharding.Mesh, Orbax checkpoints, loss-history JSON parity.

Layout convention: channels-last (NHWC / NDHWC) throughout — TPU lane dimension is
the minormost axis.  Flow convention: flow[..., i] is the displacement in pixels
along spatial axis i (row-major), i.e. (dy, dx) in 2-D and (dz, dy, dx) in 3-D.
"""

__version__ = "0.1.0"

from opticalflowscivis_tpu import ops  # noqa: F401
