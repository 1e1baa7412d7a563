"""AlphaBlender: sigmoid-gated mix of spatial and temporal branches.

Reference `AlphaBlender` (models/svd/sgm/modules/diffusionmodules/util.py:312-370)
with strategies fixed / learned / learned_with_images.  In
`learned_with_images` mode, rows flagged as still images take the spatial
branch (alpha=1) and video rows take sigmoid(mix_factor).

Convention: ``out = alpha * spatial + (1 - alpha) * temporal``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def blend_weight(
    mix_factor: jax.Array,
    *,
    strategy: str,
    image_indicator: Optional[jax.Array] = None,
) -> jax.Array:
    """Scalar/per-row alpha in [0,1]."""
    if strategy == "fixed":
        return mix_factor
    if strategy == "learned":
        return jax.nn.sigmoid(mix_factor)
    if strategy == "learned_with_images":
        assert image_indicator is not None, "learned_with_images needs image_indicator"
        return jnp.where(
            image_indicator, jnp.ones_like(image_indicator, jnp.float32),
            jax.nn.sigmoid(mix_factor)
        )
    raise ValueError(strategy)


def alpha_blend(
    spatial: jax.Array,
    temporal: jax.Array,
    mix_factor: jax.Array,
    *,
    strategy: str = "learned_with_images",
    image_indicator: Optional[jax.Array] = None,
) -> jax.Array:
    alpha = blend_weight(mix_factor, strategy=strategy, image_indicator=image_indicator)
    alpha = alpha.astype(spatial.dtype)
    while alpha.ndim < spatial.ndim:
        alpha = alpha[..., None]
    return alpha * spatial + (1.0 - alpha) * temporal
