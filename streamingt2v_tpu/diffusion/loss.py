"""Training loss: StandardDiffusionLoss + sigma samplers + loss weighting.

Rebuild of the reference's training path (StandardDiffusionLoss,
reference models/svd/sgm/modules/diffusionmodules/loss.py:12-105;
sigma samplers, sigma_sampling.py:6-31; weightings,
loss_weighting.py:13-33).  The reference never exercises this at runtime
(inference-only product, SURVEY.md §0) but ships it; here it is a pure
function suitable for pjit'd multi-chip training steps.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from streamingt2v_tpu.diffusion.denoiser import NetworkFn, denoise
from streamingt2v_tpu.diffusion.discretization import get_sigmas


def edm_sigma_sampler(key: jax.Array, n: int, p_mean: float = -1.2, p_std: float = 1.2):
    """Log-normal sigma sampling (EDMSampling)."""
    return jnp.exp(p_mean + p_std * jax.random.normal(key, (n,)))


def discrete_sigma_sampler(
    key: jax.Array, n: int, *, discretization: str = "legacy_ddpm", num_idx: int = 1000
):
    """Uniform index into a flipped discretization (DiscreteSampling)."""
    sigmas = jnp.asarray(
        get_sigmas(discretization, num_idx, append_zero=False)[::-1].copy()
    )
    idx = jax.random.randint(key, (n,), 0, num_idx)
    return sigmas[idx]


def loss_weighting(kind: str, sigma: jax.Array, sigma_data: float = 0.5) -> jax.Array:
    if kind == "unit":
        return jnp.ones_like(sigma)
    if kind == "edm":
        return (sigma**2 + sigma_data**2) / (sigma * sigma_data) ** 2
    if kind == "v":
        return (sigma**2 + 1.0) / sigma**2
    if kind == "eps":
        return sigma**-2.0
    raise ValueError(kind)


@dataclasses.dataclass(frozen=True)
class DiffusionLossConfig:
    loss_type: str = "l2"  # l2 | l1
    weighting: str = "v"
    sigma_sampler: str = "edm"  # edm | discrete
    p_mean: float = -1.2
    p_std: float = 1.2
    num_idx: int = 1000
    offset_noise_level: float = 0.0
    scaling: str = "v_edm_cnoise"


def diffusion_loss(
    cfg: DiffusionLossConfig,
    network_fn: NetworkFn,
    x0: jax.Array,
    cond: Dict[str, Any],
    key: jax.Array,
) -> jax.Array:
    """Per-example loss, mean-reduced to a scalar.  x0: clean latents
    (B, ...); cond: conditioner outputs."""
    b = x0.shape[0]
    k_sigma, k_noise, k_offset = jax.random.split(key, 3)
    if cfg.sigma_sampler == "edm":
        sigmas = edm_sigma_sampler(k_sigma, b, cfg.p_mean, cfg.p_std)
    else:
        sigmas = discrete_sigma_sampler(k_sigma, b, num_idx=cfg.num_idx)
    noise = jax.random.normal(k_noise, x0.shape, x0.dtype)
    if cfg.offset_noise_level > 0.0:
        # per-(batch, channel) offset noise, broadcast over space/time
        off = jax.random.normal(k_offset, (b,) + (1,) * (x0.ndim - 2) + (x0.shape[-1],), x0.dtype)
        noise = noise + cfg.offset_noise_level * off
    sigmas_bc = sigmas.reshape((b,) + (1,) * (x0.ndim - 1))
    noised = x0 + noise * sigmas_bc
    pred = denoise(network_fn, noised, sigmas, cond, scaling=cfg.scaling)
    w = loss_weighting(cfg.weighting, sigmas).reshape(sigmas_bc.shape)
    if cfg.loss_type == "l2":
        per_ex = jnp.mean((w * (pred - x0) ** 2).reshape(b, -1), axis=1)
    elif cfg.loss_type == "l1":
        per_ex = jnp.mean(jnp.abs(w * (pred - x0)).reshape(b, -1), axis=1)
    else:
        raise ValueError(cfg.loss_type)
    return jnp.mean(per_ex)
