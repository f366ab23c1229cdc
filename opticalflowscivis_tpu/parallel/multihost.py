"""Multi-host initialization — the DCN layer of the distributed runtime.

The reference launches one process per GPU with ``torch.distributed.launch``
and NCCL init (Flow-2D/train.py:567).  TPU-natively this is
``jax.distributed.initialize()``: afterwards ``jax.devices()`` spans all hosts,
and the same jitted-step + Mesh code path used single-host drives gradient
psums over ICI within a slice and DCN across slices — no other code changes.
"""

from __future__ import annotations

import jax


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize the jax distributed runtime (no-op if single-process).

    On Cloud TPU the arguments are auto-detected from the environment; pass
    them explicitly elsewhere.  Returns a summary dict for logging.
    """
    if num_processes is None and coordinator_address is None:
        try:
            jax.distributed.initialize()
        except Exception as e:  # noqa: BLE001 — single-process fallback
            return {
                "initialized": False,
                "reason": str(e),
                "process_index": 0,
                "process_count": 1,
                "n_devices": len(jax.devices()),
            }
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "initialized": True,
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "n_devices": len(jax.devices()),
    }
