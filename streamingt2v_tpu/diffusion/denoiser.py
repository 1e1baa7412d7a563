"""EDM-preconditioned denoiser.

Reference Denoiser.forward (denoiser.py:23-39):
  D(x, sigma) = network(x * c_in, c_noise, cond) * c_out + x * c_skip
with the scaling functions from scaling.py.  sigma is per-batch (B,);
scalings broadcast over trailing dims.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from streamingt2v_tpu.diffusion.scaling import get_scaling

NetworkFn = Callable[[jax.Array, jax.Array, Dict[str, Any]], jax.Array]


def _bdims(v: jax.Array, ndim: int) -> jax.Array:
    return v.reshape(v.shape + (1,) * (ndim - v.ndim))


def denoise(
    network_fn: NetworkFn,
    x: jax.Array,
    sigma: jax.Array,
    cond: Dict[str, Any],
    *,
    scaling: str = "v_edm_cnoise",
) -> jax.Array:
    sigma = jnp.maximum(sigma.astype(jnp.float32), 1e-12)  # log-safe at sigma=0
    c_skip, c_out, c_in, c_noise = get_scaling(scaling)(sigma)
    out = network_fn(x * _bdims(c_in, x.ndim).astype(x.dtype), c_noise, cond)
    return out.astype(jnp.float32) * _bdims(c_out, x.ndim) + x.astype(jnp.float32) * _bdims(
        c_skip, x.ndim
    )
