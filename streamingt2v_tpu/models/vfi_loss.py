"""EMA-VFI training losses.

Rebuild of the reference's VFI loss set (i2v_enhance/thirdparty/VFI/
model/loss.py): Laplacian-pyramid L1 (LapLoss) and the ternary census
loss — training-only in the reference, provided for the training-capable
surface.  Channel-last (N, H, W, C) layout.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_GAUSS = np.asarray(
    [[1, 4, 6, 4, 1], [4, 16, 24, 16, 4], [6, 24, 36, 24, 6],
     [4, 16, 24, 16, 4], [1, 4, 6, 4, 1]], np.float32
) / 256.0


def _conv_gauss(img: jax.Array, gain: float = 1.0) -> jax.Array:
    c = img.shape[-1]
    k = jnp.asarray(_GAUSS * gain)[:, :, None, None] * jnp.eye(c)[None, None]
    img = jnp.pad(img, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        img, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=1,
    )


def _upsample(x: jax.Array) -> jax.Array:
    n, h, w, c = x.shape
    up = jnp.zeros((n, h * 2, w * 2, c), x.dtype)
    up = up.at[:, ::2, ::2].set(x)
    return _conv_gauss(up, gain=4.0)


def laplacian_pyramid(img: jax.Array, max_levels: int = 5):
    pyr = []
    current = img
    for _ in range(max_levels):
        filtered = _conv_gauss(current)
        down = filtered[:, ::2, ::2]
        up = _upsample(down)
        pyr.append(current - up)
        current = down
    return pyr


def lap_loss(pred: jax.Array, target: jax.Array, max_levels: int = 5) -> jax.Array:
    pa = laplacian_pyramid(pred, max_levels)
    pb = laplacian_pyramid(target, max_levels)
    return sum(jnp.mean(jnp.abs(a - b)) for a, b in zip(pa, pb))


def _census_transform(gray: jax.Array, patch: int = 7) -> jax.Array:
    n, h, w, _ = gray.shape
    eye = np.eye(patch * patch, dtype=np.float32).reshape(patch, patch, 1, patch * patch)
    k = jnp.asarray(eye)
    patches = jax.lax.conv_general_dilated(
        gray, k, (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    t = patches - gray
    return t / jnp.sqrt(0.81 + t**2)


def ternary_loss(img0: jax.Array, img1: jax.Array) -> jax.Array:
    """Census-transform hamming distance with a valid-region mask."""
    def gray(x):
        return (0.2989 * x[..., 0:1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3])

    t0 = _census_transform(gray(img0))
    t1 = _census_transform(gray(img1))
    dist = (t0 - t1) ** 2
    dist = jnp.mean(dist / (0.1 + dist), axis=-1, keepdims=True)
    n, h, w, _ = dist.shape
    mask = jnp.zeros((1, h, w, 1)).at[:, 1:-1, 1:-1].set(1.0)
    return dist * mask
