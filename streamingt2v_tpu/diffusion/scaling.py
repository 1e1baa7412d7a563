"""EDM denoiser preconditioning scalings.

Pure functions of sigma returning (c_skip, c_out, c_in, c_noise), matching
reference denoiser_scaling.py:15-59.  The configured scaling is
VScalingWithEDMcNoise (config.yaml:138): v-prediction skip/out/in with the
EDM noise conditioning c_noise = 0.25*log(sigma).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

ScalingFn = Callable[[jax.Array], Tuple[jax.Array, jax.Array, jax.Array, jax.Array]]


def edm_scaling(sigma: jax.Array, sigma_data: float = 0.5):
    c_skip = sigma_data**2 / (sigma**2 + sigma_data**2)
    c_out = sigma * sigma_data * jax.lax.rsqrt(sigma**2 + sigma_data**2)
    c_in = jax.lax.rsqrt(sigma**2 + sigma_data**2)
    c_noise = 0.25 * jnp.log(sigma)
    return c_skip, c_out, c_in, c_noise


def eps_scaling(sigma: jax.Array):
    c_skip = jnp.ones_like(sigma)
    c_out = -sigma
    c_in = jax.lax.rsqrt(sigma**2 + 1.0)
    c_noise = sigma
    return c_skip, c_out, c_in, c_noise


def v_scaling(sigma: jax.Array):
    c_skip = 1.0 / (sigma**2 + 1.0)
    c_out = -sigma * jax.lax.rsqrt(sigma**2 + 1.0)
    c_in = jax.lax.rsqrt(sigma**2 + 1.0)
    c_noise = sigma
    return c_skip, c_out, c_in, c_noise


def v_scaling_with_edm_cnoise(sigma: jax.Array):
    c_skip, c_out, c_in, _ = v_scaling(sigma)
    c_noise = 0.25 * jnp.log(sigma)
    return c_skip, c_out, c_in, c_noise


_SCALINGS = {
    "edm": edm_scaling,
    "eps": eps_scaling,
    "v": v_scaling,
    "v_edm_cnoise": v_scaling_with_edm_cnoise,
}


def get_scaling(name: str) -> ScalingFn:
    return _SCALINGS[name]
