"""Profiling / tracing / debug utilities.

The reference's observability is wall-clock prints (Flow-2D/train.py:138-140),
``tools.time_clock`` (UPFlow/utils/tools.py:369-391) and ``tools.check_tensor``
min/max/mean printers (:1720-1738).  TPU-native upgrades:

- ``trace``: context manager around ``jax.profiler`` emitting an xplane trace
  viewable in TensorBoard/XProf.
- ``StepTimer``: step-rate meter that blocks on device results only when
  sampling (so timing does not serialize the async dispatch queue).
- ``check_tensor``: jittable min/max/mean/nan report via jax.debug.print.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Profile the enclosed block: ``with trace('/tmp/tb'): step(...)``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling it/s meter (⇔ tools.time_clock + train.py wall-clock prints)."""

    def __init__(self, sample_every: int = 50):
        self.sample_every = sample_every
        self.t0 = time.perf_counter()
        self.steps = 0
        self.rate = 0.0

    def tick(self, result=None) -> float | None:
        """Count one step; every ``sample_every`` steps, sync and report it/s."""
        self.steps += 1
        if self.steps % self.sample_every:
            return None
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        self.rate = self.sample_every / (now - self.t0)
        self.t0 = now
        return self.rate


def check_tensor(x: jax.Array, name: str = "tensor") -> None:
    """Jit-safe min/max/mean/NaN printer (⇔ tools.check_tensor)."""
    jax.debug.print(
        name + ": shape={s} min={mn:.5f} max={mx:.5f} mean={me:.5f} nan={nan}",
        s=x.shape,
        mn=jnp.min(x).astype(jnp.float32),
        mx=jnp.max(x).astype(jnp.float32),
        me=jnp.mean(x.astype(jnp.float32)),
        nan=jnp.any(jnp.isnan(x)),
    )
