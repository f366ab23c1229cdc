"""LR schedule — linear warmup + cosine decay (Flow-2D/train.py:47-53).

Reference semantics: lr = 3e-4 * step/2000 for step < 2000, then a cosine from
3e-4 down to 3e-6 over the remaining (epochs*steps_per_epoch - 2000) steps; the
result is multiplied by world_size/4 (train.py:162).
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine(
    lr_max: float = 3e-4,
    lr_min: float = 3e-6,
    warmup_steps: int = 2000,
    total_steps: int = 100_000,
    world_scale: float = 1.0,
):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr_max * step / max(warmup_steps, 1)
        denom = max(total_steps - warmup_steps, 1)
        # clamp past the horizon: a resumed run whose restored step exceeds
        # total_steps must hold lr_min, not ride the cosine back up
        frac = jnp.clip((step - warmup_steps) / denom, 0.0, 1.0)
        mul = jnp.cos(frac * jnp.pi) * 0.5 + 0.5
        decay = (lr_max - lr_min) * mul + lr_min
        return jnp.where(step < warmup_steps, warm, decay) * world_scale

    return schedule
