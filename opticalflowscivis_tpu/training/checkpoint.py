"""Checkpointing via Orbax — params + optimizer state + step.

The reference saves only ``state_dict`` pkls on rank 0 (RIFE.py:61-64) and never
the optimizer, so resume restarts AdamW (SURVEY.md §5); we checkpoint the full
TrainState.  Relaxed partial loads (UPFlow tools.py:116-133 ``if_relax``) are
available through ``restore_params(..., relax=True)``.
"""

from __future__ import annotations

from typing import Any

import jax
import orbax.checkpoint as ocp


_CHECKPOINTER: ocp.PyTreeCheckpointer | None = None


def _checkpointer() -> ocp.PyTreeCheckpointer:
    # One process-wide checkpointer: constructing a fresh PyTreeCheckpointer
    # per save leaks worker threads/memory over long runs (trainer processes
    # died silently after ~70-90 epochs before this was shared).
    global _CHECKPOINTER
    if _CHECKPOINTER is None:
        _CHECKPOINTER = ocp.PyTreeCheckpointer()
    return _CHECKPOINTER


def save_state(path: str, state: Any) -> None:
    _checkpointer().save(path, state, force=True)


def restore_state(path: str, target: Any) -> Any:
    """Restore into the structure of ``target`` (shapes/dtypes must match)."""
    restored = _checkpointer().restore(path, item=target)
    return restored


def restore_params(path: str, target_params: Any, relax: bool = False) -> Any:
    """Restore a params pytree; ``relax`` keeps target leaves missing from disk."""
    if not relax:
        return _checkpointer().restore(path, item=target_params)
    restored = _checkpointer().restore(path)
    flat_t = dict(jax.tree_util.tree_flatten_with_path(target_params)[0])
    flat_r = dict(jax.tree_util.tree_flatten_with_path(restored)[0])
    merged = {k: flat_r.get(k, v) for k, v in flat_t.items()}
    treedef = jax.tree_util.tree_structure(target_params)
    return jax.tree_util.tree_unflatten(treedef, list(merged.values()))
