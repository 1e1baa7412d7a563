"""LR schedules as optax-compatible schedule functions.

Rebuild of sgm lr_scheduler.py (LambdaWarmUpCosineScheduler{,2} and the
linear variant) as pure functions of the step count; use with
`optax.scale_by_schedule` or as `optax.adamw(learning_rate=schedule)`.
Multipliers are relative to a base LR of 1.0, like the reference.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def warmup_cosine(warm_up_steps: int, lr_min: float, lr_max: float,
                  lr_start: float, max_decay_steps: int):
    def schedule(n):
        import jax.numpy as jnp

        n = jnp.asarray(n, jnp.float32)
        warm = (lr_max - lr_start) / warm_up_steps * n + lr_start
        t = jnp.clip((n - warm_up_steps) / max(max_decay_steps - warm_up_steps, 1), 0, 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(n < warm_up_steps, warm, cos)

    return schedule


def _cycle_index(n: np.ndarray, cum_cycles: np.ndarray):
    import jax.numpy as jnp

    return jnp.clip(jnp.searchsorted(jnp.asarray(cum_cycles[1:]), n, side="right"),
                    0, len(cum_cycles) - 2)


def warmup_cosine_cycles(warm_up_steps: Sequence[int], f_min: Sequence[float],
                         f_max: Sequence[float], f_start: Sequence[float],
                         cycle_lengths: Sequence[int]):
    """LambdaWarmUpCosineScheduler2: repeated warmup+cosine cycles."""
    import jax.numpy as jnp

    cum = np.cumsum(np.concatenate([[0], np.asarray(cycle_lengths)]))
    wu = jnp.asarray(warm_up_steps, jnp.float32)
    fmin = jnp.asarray(f_min, jnp.float32)
    fmax = jnp.asarray(f_max, jnp.float32)
    fstart = jnp.asarray(f_start, jnp.float32)
    lengths = jnp.asarray(cycle_lengths, jnp.float32)
    cumj = jnp.asarray(cum, jnp.float32)

    def schedule(n):
        n = jnp.asarray(n, jnp.float32)
        c = _cycle_index(n, cum)
        nc = n - cumj[c]
        warm = (fmax[c] - fstart[c]) / wu[c] * nc + fstart[c]
        t = jnp.clip((nc - wu[c]) / jnp.maximum(lengths[c] - wu[c], 1.0), 0, 1.0)
        cos = fmin[c] + 0.5 * (fmax[c] - fmin[c]) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(nc < wu[c], warm, cos)

    return schedule


def warmup_linear_cycles(warm_up_steps: Sequence[int], f_min: Sequence[float],
                         f_max: Sequence[float], f_start: Sequence[float],
                         cycle_lengths: Sequence[int]):
    """LambdaLinearScheduler: warmup then linear decay to f_min per cycle."""
    import jax.numpy as jnp

    cum = np.cumsum(np.concatenate([[0], np.asarray(cycle_lengths)]))
    wu = jnp.asarray(warm_up_steps, jnp.float32)
    fmin = jnp.asarray(f_min, jnp.float32)
    fmax = jnp.asarray(f_max, jnp.float32)
    fstart = jnp.asarray(f_start, jnp.float32)
    lengths = jnp.asarray(cycle_lengths, jnp.float32)
    cumj = jnp.asarray(cum, jnp.float32)

    def schedule(n):
        n = jnp.asarray(n, jnp.float32)
        c = _cycle_index(n, cum)
        nc = n - cumj[c]
        warm = (fmax[c] - fstart[c]) / wu[c] * nc + fstart[c]
        lin = fmin[c] + (fmax[c] - fmin[c]) * (lengths[c] - nc) / lengths[c]
        return jnp.where(nc < wu[c], warm, lin)

    return schedule
