"""Adversarial autoencoder losses.

Rebuild of sgm's GAN training path
(models/svd/sgm/modules/autoencoding/losses/discriminator_loss.py):
PatchGAN (NLayer) discriminator, hinge/vanilla adversarial losses, and
the adaptive generator weight.  The perceptual term (LPIPS) lives in
diffusion/lpips.py.  The reference never runs this at inference; it is
part of the training-capable engine surface.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class PatchDiscriminator(nn.Module):
    """NLayerDiscriminator (PatchGAN): strided convs + instance-norm-free
    leaky-ReLU ladder."""

    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=1, name="conv0")(x)
        h = jax.nn.leaky_relu(h, 0.2)
        nf = self.ndf
        for i in range(1, self.n_layers):
            nf = min(self.ndf * 2**i, self.ndf * 8)
            h = nn.Conv(nf, (4, 4), strides=(2, 2), padding=1, use_bias=False,
                        name=f"conv{i}")(h)
            h = nn.GroupNorm(num_groups=None, group_size=1, name=f"norm{i}")(h)
            h = jax.nn.leaky_relu(h, 0.2)
        nf = min(self.ndf * 2**self.n_layers, self.ndf * 8)
        h = nn.Conv(nf, (4, 4), strides=(1, 1), padding=1, use_bias=False, name="conv_last")(h)
        h = nn.GroupNorm(num_groups=None, group_size=1, name="norm_last")(h)
        h = jax.nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), padding=1, name="conv_out")(h)


def hinge_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    return 0.5 * (
        jnp.mean(jax.nn.relu(1.0 - logits_real))
        + jnp.mean(jax.nn.relu(1.0 + logits_fake))
    )


def vanilla_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real))
        + jnp.mean(jax.nn.softplus(logits_fake))
    )


def generator_loss(logits_fake: jax.Array) -> jax.Array:
    return -jnp.mean(logits_fake)


def adaptive_weight(nll_grad_norm: jax.Array, g_grad_norm: jax.Array,
                    clip: float = 1e4) -> jax.Array:
    """calculate_adaptive_weight: ||d nll|| / ||d g_loss|| on the last
    decoder layer (discriminator_loss.py)."""
    w = nll_grad_norm / (g_grad_norm + 1e-4)
    return jnp.clip(w, 0.0, clip)
