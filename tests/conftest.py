"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the reference's "test multi-node without a cluster" answer (SURVEY.md §4):
XLA_FLAGS host-platform device count must be set before jax initializes.
"""

import os

# The test environment may force a hardware platform via JAX_PLATFORMS (e.g.
# the axon TPU tunnel) and a sitecustomize hook that reads it at startup, so
# plain env vars are not enough — override through jax.config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8, "virtual 8-device CPU mesh not active"
