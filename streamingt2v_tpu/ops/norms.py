"""Normalization primitives (channel-last layouts).

The reference uses torch GroupNorm(32) everywhere (sgm
`normalization`, modules/diffusionmodules/util.py:301-311) and LayerNorm in
transformer blocks.  On TPU these are bandwidth-bound elementwise chains
that XLA fuses into neighboring matmuls/convs, so they are expressed as
plain jnp with fp32 statistics; a Pallas fusion is only warranted where a
profile shows an unfused boundary.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def group_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    num_groups: int = 32,
    eps: float = 1e-6,
    act: Optional[str] = None,
) -> jax.Array:
    """GroupNorm over the trailing channel axis of (..., C), optionally fused
    with SiLU (`act='silu'`), the UNet's ubiquitous norm->act pair."""
    c = x.shape[-1]
    # Clamp for tiny test configs; production channel counts are >=128 so
    # this never diverges from the reference GroupNorm(32, C).
    num_groups = min(num_groups, c)
    assert c % num_groups == 0, (c, num_groups)
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], num_groups, c // num_groups)
    # statistics over all non-batch dims: group channels and spatial dims.
    red_axes = tuple(range(1, xf.ndim - 2)) + (xf.ndim - 1,)
    mean = jnp.mean(xf, axis=red_axes, keepdims=True)
    var = jnp.var(xf, axis=red_axes, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = xf.reshape(x.shape) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if act == "silu":
        out = out * jax.nn.sigmoid(out)
    elif act is not None:
        raise ValueError(act)
    return out.astype(orig_dtype)


def layer_norm(
    x: jax.Array,
    scale: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    *,
    eps: float = 1e-5,
) -> jax.Array:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        out = out * scale.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(orig_dtype)
