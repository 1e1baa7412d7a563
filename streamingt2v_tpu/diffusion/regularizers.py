"""Autoencoder regularizers.

Rebuild of sgm's regularizer set (models/svd/sgm/modules/autoencoding/
regularizers/): DiagonalGaussianRegularizer (__init__.py:13-31) and the
VectorQuantizer (quantize.py — shipped but unused in the reference
runtime; provided for the training-capable engine).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def diagonal_gaussian(moments: jax.Array, key: Optional[jax.Array] = None
                      ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """moments: (..., 2C) -> (z, {'kl_loss'}).  Sample when key given,
    mode otherwise (AutoencoderKLModeOnly semantics)."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    if key is not None:
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape, mean.dtype)
    else:
        z = mean
    var = jnp.exp(logvar)
    kl = 0.5 * jnp.sum(mean**2 + var - 1.0 - logvar, axis=tuple(range(1, mean.ndim)))
    return z, {"kl_loss": jnp.mean(kl)}


class VectorQuantizer(nn.Module):
    """Nearest-codebook quantization with straight-through gradients and
    commitment loss (sgm quantize.py VectorQuantize core)."""

    codebook_size: int
    dim: int
    beta: float = 0.25

    @nn.compact
    def __call__(self, z: jax.Array) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        codebook = self.param(
            "codebook",
            nn.initializers.uniform(scale=2.0 / self.codebook_size),
            (self.codebook_size, self.dim),
        )
        flat = z.reshape(-1, self.dim)
        d = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            - 2.0 * flat @ codebook.T
            + jnp.sum(codebook**2, axis=1)[None]
        )
        idx = jnp.argmin(d, axis=1)
        zq = codebook[idx].reshape(z.shape)
        commit = jnp.mean((jax.lax.stop_gradient(zq) - z) ** 2)
        embed = jnp.mean((zq - jax.lax.stop_gradient(z)) ** 2)
        loss = embed + self.beta * commit
        zq = z + jax.lax.stop_gradient(zq - z)  # straight-through
        return zq, {"vq_loss": loss, "indices": idx.reshape(z.shape[:-1])}
