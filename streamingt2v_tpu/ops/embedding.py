"""Sinusoidal timestep/position embeddings.

Matches reference `timestep_embedding`
(models/svd/sgm/modules/diffusionmodules/util.py:207-236): half cos / half
sin, frequencies exp(-log(max_period) * i / half), optional repeat-only mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    *,
    max_period: float = 10000.0,
    repeat_only: bool = False,
    dtype=jnp.float32,
) -> jax.Array:
    """timesteps: (N,) -> (N, dim)."""
    timesteps = timesteps.astype(jnp.float32).reshape(-1)
    if repeat_only:
        return jnp.repeat(timesteps[:, None], dim, axis=1).astype(dtype)
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb.astype(dtype)
