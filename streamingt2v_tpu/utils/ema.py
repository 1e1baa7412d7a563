"""Exponential moving average of a param pytree.

Rebuild of sgm `LitEma` (models/svd/sgm/modules/ema.py:5-86): shadow
params with warmup-adjusted decay min(decay, (1+n)/(10+n)), pure-pytree
so it lives inside pjit'd train steps.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    shadow: Any
    num_updates: jnp.ndarray  # int32 scalar


def ema_init(params) -> EmaState:
    return EmaState(
        shadow=jax.tree.map(jnp.array, params),
        num_updates=jnp.zeros((), jnp.int32),
    )


def ema_update(state: EmaState, params, decay: float = 0.9999,
               use_num_updates: bool = True) -> EmaState:
    n = state.num_updates + 1
    if use_num_updates:
        d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    else:
        d = jnp.asarray(decay)
    one_minus = 1.0 - d
    shadow = jax.tree.map(
        lambda s, p: s - one_minus.astype(s.dtype) * (s - p.astype(s.dtype)),
        state.shadow, params,
    )
    return EmaState(shadow=shadow, num_updates=n)


def ema_params(state: EmaState):
    """The averaged params (copy_to in the reference)."""
    return state.shadow
