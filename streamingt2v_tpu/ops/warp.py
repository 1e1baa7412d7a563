"""Backward warping (grid_sample equivalent) for optical-flow models.

TPU replacement for the reference's `torch.nn.functional.grid_sample`
backward warp (i2v_enhance/thirdparty/VFI/model/warplayer.py:7-22):
bilinear sampling at (x + flow_x, y + flow_y) with border clamping —
the reference's normalized-grid + align_corners=True round trip reduces
to exactly this pixel-space form.

Implemented as gather-free bilinear interpolation: the 4 neighbor reads
become two one-hot matmuls per axis is overkill; instead we use
`jnp.take`-style advanced indexing which XLA lowers to dynamic-gather —
acceptable on TPU for the VFI workload (flow fields are /4..../16 scale).
A Pallas gather kernel is the upgrade path if profiling shows this hot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def backward_warp(x: jax.Array, flow: jax.Array) -> jax.Array:
    """x: (B, H, W, C); flow: (B, H, W, 2) pixel displacements (dx, dy).
    Returns x sampled at (col + dx, row + dy), bilinear, border-clamped."""
    b, h, w, c = x.shape
    rows = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    cols = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    sx = cols + flow[..., 0]
    sy = rows + flow[..., 1]
    sx = jnp.clip(sx, 0.0, w - 1.0)
    sy = jnp.clip(sy, 0.0, h - 1.0)

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)

    batch_idx = jnp.arange(b)[:, None, None]

    def gather(yi, xi):
        return x[batch_idx, yi, xi]

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy
